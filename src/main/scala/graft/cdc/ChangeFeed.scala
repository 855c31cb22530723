package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change feed between two table states — the consumer side of Hudi's
  * incremental query (the reference's DeltaStreamer pipeline feeds
  * downstream jobs exactly this way: "give me what changed since my
  * last pull" instead of a full re-read, README.md:300-307). The COW
  * snapshot protocol retains the current and one prior version
  * ([[Ingest]] GC policy) precisely so a reader that resolved the old
  * pointer can still diff against it.
  *
  * Semantics: key-level diff of two already-collapsed snapshots.
  * `insert` = key only in the newer state, `delete` = key only in the
  * older, `update` = key in both with a different ordering value
  * (the precombine column moved — attribute-identical rewrites don't
  * exist under latest-wins lsn ordering). Before/after images ride
  * along, which is what makes the feed replayable downstream.
  *
  * Scale: ONE full-outer shuffle join on the record key — both sides
  * hash-partition once; no window, no driver state. At 100 TB the two
  * sides are the same table's versions, so co-partitioned bucketed
  * layouts ([[FileGroups]]) join without re-shuffling either side.
  */
object ChangeFeed {

  /** Key-level diff of two collapsed snapshots (older → newer).
    * `image` columns are carried as `before_<c>` / `after_<c>` for each
    * of `carryCols`; the ordering column `ord` decides update vs
    * no-change. */
  def diff(older: DataFrame, newer: DataFrame, keys: Seq[String], ord: String,
           carryCols: Seq[String]): DataFrame = {
    val o = older.select((keys ++ (ord +: carryCols)).map(col): _*)
      .withColumnsRenamed(((ord +: carryCols)).map(c => c -> s"before_$c").toMap)
    val n = newer.select((keys ++ (ord +: carryCols)).map(col): _*)
      .withColumnsRenamed(((ord +: carryCols)).map(c => c -> s"after_$c").toMap)
    o.join(n, keys, "full_outer")
      .withColumn("change_op",
        when(col(s"before_$ord").isNull, lit("i"))
          .when(col(s"after_$ord").isNull, lit("d"))
          .when(col(s"before_$ord") =!= col(s"after_$ord"), lit("u")))
      .filter(col("change_op").isNotNull)
  }

  /** The table-layer feed: diff two RETAINED committed versions of a
    * versioned-snapshot table (None when either version is gone — the
    * caller must re-bootstrap from a full snapshot, Hudi's
    * incremental-fallback rule). */
  def betweenVersions(spark: SparkSession, dir: String, fromId: Long, toId: Long,
                      keys: Seq[String], ord: String, carryCols: Seq[String]): Option[DataFrame] =
    for {
      o <- Ingest.readSnapshotAt(spark, dir, fromId)
      n <- Ingest.readSnapshotAt(spark, dir, toId)
    } yield diff(o, n, keys, ord, carryCols)
}
