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
  *  - an EMPTY batch commits its marker but writes no data dirs (an
  *    empty partitioned parquet write produces a schema-less dir that
  *    poisons every later read), so delta readers take only the dirs
  *    that exist.
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

  def commitDeltaMarker(spark: SparkSession, dir: String, id: Long): Unit =
    fsOf(spark).createNewFile(path(s"$dir/_DELTA_$id"))

  /** The candidate dirs that actually hold data. An empty-batch append
    * commits its marker without data dirs; a buildEmpty index has no
    * base dir — both read as "contributes nothing", never as a
    * schema-inference failure. */
  def existingDirs(spark: SparkSession, dirs: Seq[String]): Seq[String] = {
    val fs = fsOf(spark)
    dirs.filter(d => fs.exists(path(d)))
  }

  /** True when the batch has no rows — one LocalLimit(1) job, paid
    * once per append to keep the empty-write poison out of the layout. */
  def batchIsEmpty(batch: DataFrame): Boolean = batch.isEmpty
}
