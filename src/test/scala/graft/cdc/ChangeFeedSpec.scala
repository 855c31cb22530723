package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental change feed over retained COW versions: a
  * handcrafted two-commit table whose diff is known by inspection. */
class ChangeFeedSpec extends SparkSpec {

  import spark.implicits._

  test("betweenVersions: insert/update/delete with before/after images") {
    val dir = tmpDir("graft_feed") + "/t"
    // v0: keys 1,2,3 inserted; v1: 2 updated, 3 deleted, 4 inserted
    val b0 = Seq((1L, 10L, "c", 1.0), (2L, 20L, "c", 2.0), (3L, 30L, "c", 3.0))
      .toDF("id", "lsn", "op", "value")
    val b1 = Seq((2L, 40L, "u", 2.5), (3L, 50L, "d", 0.0), (4L, 60L, "c", 4.0))
      .toDF("id", "lsn", "op", "value")
    MergeOnRead.logAppend(spark, dir, b0, 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn"))
    MergeOnRead.logAppend(spark, dir, b1, 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn"))
    assert(Ingest.snapshotVersions(spark, dir) == Seq(0L, 1L)) // both retained

    val feed = ChangeFeed.betweenVersions(spark, dir, 0L, 1L,
      Seq("id"), "lsn", Seq("value")).get
      .select($"id", $"change_op", $"before_value", $"after_value")
      .as[(Long, String, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(feed == Seq(
      (2L, "u", Some(2.0), Some(2.5)),
      (3L, "d", Some(3.0), None),
      (4L, "i", None, Some(4.0))))

    // a GC'd version yields None (re-bootstrap signal), not garbage
    assert(ChangeFeed.betweenVersions(spark, dir, 99L, 1L,
      Seq("id"), "lsn", Seq("value")).isEmpty)
  }

  test("incremental consumer: a downstream aggregate maintained from deltas equals recompute") {
    // the reason the feed exists: a downstream job holds sum(value) and
    // applies after - before per changed key instead of re-reading the
    // table. Replayed over two commits, the maintained total must equal
    // the recomputed one exactly.
    val dir = tmpDir("graft_feed2") + "/t"
    val b0 = Seq((1L, 10L, "c", 1.0), (2L, 20L, "c", 2.0), (3L, 30L, "c", 3.0))
      .toDF("id", "lsn", "op", "value")
    MergeOnRead.logAppend(spark, dir, b0, 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn"))
    var downstream = Ingest.readSnapshotAt(spark, dir, 0L).get
      .agg(sum($"value")).as[Double].head()

    val b1 = Seq((2L, 40L, "u", 2.5), (3L, 50L, "d", 0.0), (4L, 60L, "c", 4.0))
      .toDF("id", "lsn", "op", "value")
    MergeOnRead.logAppend(spark, dir, b1, 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn"))

    val delta = ChangeFeed.betweenVersions(spark, dir, 0L, 1L, Seq("id"), "lsn", Seq("value")).get
      .agg(sum(coalesce($"after_value", lit(0.0)) - coalesce($"before_value", lit(0.0))))
      .as[Double].head()
    downstream += delta

    val recomputed = Ingest.readSnapshotAt(spark, dir, 1L).get
      .agg(sum($"value")).as[Double].head()
    assert(downstream == recomputed, s"maintained $downstream vs recomputed $recomputed")
  }

  test("file-group versions diff too: manifest time travel feeds the same change feed") {
    val dir = tmpDir("graft_feed_fg") + "/t"
    val b0 = Seq((1L, 10L, "c", 1.0), (2L, 20L, "c", 2.0)).toDF("id", "lsn", "op", "value")
    FileGroups.commit(spark, dir, b0, 0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    val b1 = Seq((2L, 30L, "u", 2.5), (3L, 40L, "c", 3.0)).toDF("id", "lsn", "op", "value")
    FileGroups.commit(spark, dir, b1, 1L, Seq("id"), Seq("lsn"))
    val feed = ChangeFeed.diff(
        FileGroups.readAt(spark, dir, 0L).get,
        FileGroups.readAt(spark, dir, 1L).get,
        Seq("id"), "lsn", Seq("value"))
      .select($"id", $"change_op").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(feed == Seq((2L, "u"), (3L, "i")))
  }

  test("diff of identical snapshots is empty; ord moves alone mark updates") {
    val s0 = Seq((1L, 10L, 1.0), (2L, 20L, 2.0)).toDF("id", "lsn", "value")
    assert(ChangeFeed.diff(s0, s0, Seq("id"), "lsn", Seq("value")).count() == 0)
    // same attributes, newer lsn: still an update (the row was rewritten)
    val s1 = Seq((1L, 10L, 1.0), (2L, 99L, 2.0)).toDF("id", "lsn", "value")
    val d = ChangeFeed.diff(s0, s1, Seq("id"), "lsn", Seq("value"))
      .select($"id", $"change_op").as[(Long, String)].collect().toSeq
    assert(d == Seq((2L, "u")))
  }
}
