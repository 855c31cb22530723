package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted duplicate-cluster assignment, maintained incrementally —
  * the streaming-side state behind stream_cluster_e2e and the
  * serving surface for "which cluster is this doc in" lookups. Each
  * ingest batch runs [[Components.mergeBatch]] (condensed-graph merge:
  * batch-sized work, bit-equal to a full recompute — see its scaladoc)
  * and commits the updated assignment as a VERSIONED snapshot under
  * the shared [[DeltaProtocol]] crash rules:
  *
  *  - `state_v<id>` data dir first, `_DELTA_<id>` marker LAST — a
  *    crash mid-write leaves an uncommitted, invisible version;
  *  - a committed id is a replay no-op (streaming exactly-once);
  *  - an empty batch commits an `empty` marker and writes no dir;
  *  - readers serve the LATEST live version and fail loudly when its
  *    data dir is missing.
  *
  * Snapshot-per-version is the [[graft.cdc.Ingest]] COW commit shape,
  * not a contradiction of "incremental": the MERGE work is condensed
  * batch-sized; only the final relabel pass (one narrow map, no
  * shuffle) touches state-sized bytes, and at 100 TB that pass writes
  * only the buckets holding renamed labels when the state table is
  * bucketed by label (the [[graft.cdc.FileGroups]] layout).
  */
object ClusterStore {

  import DeltaProtocol.{fsOf, path}

  def exists(spark: SparkSession, dir: String): Boolean =
    DeltaProtocol.markerExists(spark, dir)

  /** Initialize an empty store: every batch (including the first) then
    * enters through [[append]], so the replay rules apply uniformly. */
  def buildEmpty(spark: SparkSession, dir: String): Unit = {
    DeltaProtocol.clearPriorIndex(spark, dir, Seq("state_v"))
    val fs = fsOf(spark, dir)
    fs.mkdirs(path(dir))
    val out = fs.create(path(s"$dir/_INDEX"), true)
    out.close()
  }

  def deltaIds(spark: SparkSession, dir: String): Seq[Long] =
    DeltaProtocol.deltaIds(spark, dir)

  /** Current (id, lab) assignment: the latest live version's snapshot;
    * empty frame before the first data-carrying batch. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    require(exists(spark, dir), s"no committed cluster store at $dir — buildEmpty first")
    DeltaProtocol.liveDeltaIds(spark, dir).lastOption match {
      case Some(v) =>
        DeltaProtocol.requireDirs(spark, dir, Seq(s"state_v$v"), "cluster state")
        spark.read.parquet(s"$dir/state_v$v")
      case None =>
        spark.range(0).select(col("id"), col("id").as("lab"))
    }
  }

  /** Merge batch `id`'s new nodes + fired edges into the assignment and
    * commit it as version `id` — data dir first, marker last. A
    * committed id must be skipped by the caller (via [[deltaIds]], same
    * contract as the index siblings); a replay after a crash between
    * the snapshot write and the marker recomputes an identical snapshot
    * from the unchanged previous version. */
  def append(spark: SparkSession, dir: String, newNodes: DataFrame,
             newEdges: DataFrame, id: Long): Unit = {
    require(exists(spark, dir), s"no committed cluster store at $dir — buildEmpty first")
    // Snapshots CHAIN (each state_v<id> is built from the then-current
    // state and read() serves the max live id) — unlike the additive
    // sketch stores, append order is semantic. An id at or below the
    // committed max would build from the LATER state but never be
    // served: a committed marker whose content is permanently invisible
    // and whose replay is a no-op. Fail loudly instead.
    DeltaProtocol.deltaIds(spark, dir).lastOption.foreach(last =>
      require(id > last,
        s"ClusterStore.append at $dir: batch id $id is not above the last " +
          s"committed id $last — state snapshots chain by id, so an out-of-order " +
          "append would be committed but never served"))
    if (DeltaProtocol.batchIsEmpty(newNodes) && DeltaProtocol.batchIsEmpty(newEdges))
      DeltaProtocol.commitDeltaMarker(spark, dir, id, empty = true)
    else {
      val next = Components.mergeBatch(read(spark, dir), newNodes, newEdges)
      next.write.mode("overwrite").parquet(s"$dir/state_v$id")
      DeltaProtocol.commitDeltaMarker(spark, dir, id)
    }
  }
}
