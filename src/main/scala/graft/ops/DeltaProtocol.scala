package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared delta-append bookkeeping all three persisted indexes
  * ([[LshIndex]], [[IvfIndex]], [[IvfPqIndex]]) run — ONE copy of the
  * crash rules so a protocol fix can't drift between siblings:
  *
  *  - data dirs first, `_DELTA_<id>` marker LAST: a crash mid-append
  *    leaves an uncommitted, invisible delta;
  *  - a committed id is a replay no-op (streaming exactly-once);
  *  - a rebuild drops the commit marker FIRST, then every delta marker,
  *    then the delta data — a crash mid-rebuild must leave an
  *    uncommitted index, never a readable mismatch;
  *  - an EMPTY batch commits its marker WITH THE CONTENT `empty` and
  *    writes no data dirs (an empty partitioned parquet write produces
  *    a schema-less dir that poisons every later read); readers skip
  *    exactly the deltas whose marker says so and FAIL LOUDLY when a
  *    live delta's data dir is missing — a silent skip would turn an
  *    incomplete restore (marker copied, data lost) into quiet result
  *    loss.
  */
private[graft] object DeltaProtocol {

  def fsOf(spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  def path(s: String) = new org.apache.hadoop.fs.Path(s)

  def markerExists(spark: SparkSession, dir: String, marker: String = "_INDEX"): Boolean =
    fsOf(spark).exists(path(s"$dir/$marker"))

  /** Committed delta ids, sorted. */
  def deltaIds(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark)
    if (!fs.exists(path(dir))) Seq.empty
    else fs.listStatus(path(dir)).map(_.getPath.getName)
      .collect { case n if n.startsWith("_DELTA_") => n.stripPrefix("_DELTA_").toLong }
      .toSeq.sorted
  }

  /** Rebuild-time purge: commit marker first, then every delta marker
    * (committed or orphaned), then every delta data dir matching
    * `dataPrefixes`. */
  def clearPriorIndex(spark: SparkSession, dir: String,
                      dataPrefixes: Seq[String]): Unit = {
    val fs = fsOf(spark)
    fs.delete(path(s"$dir/_INDEX"), false)
    if (fs.exists(path(dir))) {
      fs.listStatus(path(dir)).map(_.getPath.getName)
        .filter(_.startsWith("_DELTA_")).foreach(n => fs.delete(path(s"$dir/$n"), false))
      fs.listStatus(path(dir)).map(_.getPath.getName)
        .filter(n => dataPrefixes.exists(n.startsWith))
        .foreach(n => fs.delete(path(s"$dir/$n"), true))
    }
  }

  /** Marker content `empty` records a data-less delta — the signal that
    * lets readers distinguish "legitimately nothing to read" from
    * "data dir lost". */
  def commitDeltaMarker(spark: SparkSession, dir: String, id: Long,
                        empty: Boolean = false): Unit = {
    val out = fsOf(spark).create(path(s"$dir/_DELTA_$id"), true)
    try { if (empty) out.write("empty".getBytes("UTF-8")) } finally out.close()
  }

  def deltaIsEmpty(spark: SparkSession, dir: String, id: Long): Boolean = {
    val in = fsOf(spark).open(path(s"$dir/_DELTA_$id"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.trim == "empty"
  }

  /** Committed delta ids that carry data (marker not `empty`), sorted.
    * Pre-protocol markers (zero-length files) read as live. */
  def liveDeltaIds(spark: SparkSession, dir: String): Seq[Long] =
    deltaIds(spark, dir).filterNot(id => deltaIsEmpty(spark, dir, id))

  /** Fail-loud guard for the read path: every dir a live delta (or the
    * base) is supposed to have MUST exist — a missing one means the
    * layout was corrupted or restored incompletely, and serving partial
    * results silently would be worse than failing. */
  def requireDirs(spark: SparkSession, dirs: Seq[String], what: String): Unit = {
    val fs = fsOf(spark)
    dirs.foreach(d => require(fs.exists(path(d)),
      s"$what data dir missing: $d — index layout corrupted or restored " +
        "incompletely; rebuild the index"))
  }

  /** True when the batch has no rows — one LocalLimit(1) job, paid
    * once per append to keep the empty-write poison out of the layout. */
  def batchIsEmpty(batch: DataFrame): Boolean = batch.isEmpty
}
