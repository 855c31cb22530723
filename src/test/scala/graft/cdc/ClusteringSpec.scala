package graft.cdc

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The clustering REPLACE commit: layout changes, contents never do,
  * readers follow the pointer, and a later COW commit supersedes it. */
class ClusteringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // base committed through the MOR service (same v<id>/_COMMIT_ protocol)
  private def mkTable(dir: String): Unit = {
    val log = Tables.events(spark, sf).select(
      col("user_id").as("id"), col("event_id").as("lsn"),
      lit("c").as("op"), col("value"))
    MergeOnRead.logAppend(spark, dir, log, 0L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn"))
  }

  test("zvalue interleaves bits (matches a bit-twiddling reference)") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).reduce(_ | _)
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (1023L, 512L), (123456L, 654321L))
    val got = samples.toDF("a", "b")
      .select(Clustering.zvalue(col("a"), col("b"), 21).as("z")).as[Long].collect()
    assert(got.toSeq == samples.map { case (a, b) => ref(a, b, 21) })
  }

  test("cluster: contents identical, file key-ranges pairwise disjoint, reader follows") {
    val dir = tmpDir("graft_cluster") + "/t"
    mkTable(dir)
    val before = Ingest.readSnapshot(spark, dir).get.orderBy("id", "lsn").collect()
    val id = Clustering.cluster(spark, dir, Seq(col("id")), files = 4)
    assert(id.contains(0L))
    // reader now resolves the clustered copy
    assert(Clustering.baseDir(spark, dir).get.endsWith("/c0"))
    val after = Ingest.readSnapshot(spark, dir).get
    assert(after.orderBy("id", "lsn").collect().toSeq == before.toSeq)
    // per-file [min,max] of the clustering key must not overlap — the
    // property parquet min/max skipping needs to prune range scans
    val ranges = after
      .groupBy(input_file_name().as("f"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, ranges.mkString(","))
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi <= lo2, s"overlapping file ranges: ${ranges.mkString(",")}")
    // idempotent: a second pass is a no-op
    assert(Clustering.cluster(spark, dir, Seq(col("id"))).isEmpty)
  }

  test("z-order clustering prunes files on BOTH dimensions; single-column range-sort cannot") {
    // A 32x32 grid table derived from events (a = event_id mod 32,
    // b = event_id div 32 mod 32 — independent uniform coordinates),
    // committed as a base version, then clustered two ways into fresh
    // tables. Per-file [min,max] of each coordinate (input_file_name
    // aggregation — exactly the footer stats parquet min/max skipping
    // consults) decides which files a single-column range predicate
    // must touch.
    val grid = Tables.events(spark, sf).select(
      col("event_id").as("k"),
      pmod(col("event_id"), lit(32)).as("a"),
      pmod(col("event_id") / 32, lit(32)).cast("long").as("b"),
      col("value"))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def commitBase(dir: String): Unit = {
      grid.write.parquet(s"$dir/v0")
      fs.createNewFile(new org.apache.hadoop.fs.Path(s"$dir/_COMMIT_0"))
    }
    // per-file [min,max] of `c` over the clustered layout; how many
    // files would a predicate `c in [0, 8)` (a quarter of the span)
    // have to read?
    def touched(dir: String, c: String): (Int, Int) = {
      val ranges = Ingest.readSnapshot(spark, dir).get
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      (ranges.count { case (lo, hi) => lo < 8 && hi >= 0 }, ranges.length)
    }

    val zdir = tmpDir("graft_zorder") + "/t"
    commitBase(zdir)
    val before = Ingest.readSnapshot(spark, zdir).get.orderBy("k").collect()
    assert(Clustering.cluster(spark, zdir,
      Seq(Clustering.zvalue(col("a"), col("b"), bits = 5)), files = 64).contains(0L))
    // REPLACE-commit invariant holds for the z-value sort key too
    assert(Ingest.readSnapshot(spark, zdir).get.orderBy("k").collect().toSeq == before.toSeq)
    val (za, zn) = touched(zdir, "a")
    val (zb, _) = touched(zdir, "b")
    assert(zn >= 48, s"expected ~64 clustered files, got $zn")
    // z-layout: a quarter-span predicate on EITHER dimension reads at
    // most 40% of the files. Bound, not ideal: the matching z-cells
    // form 16/64 aligned file-slots in <= 4 contiguous z-runs, and the
    // sampled range boundaries add at most 2 straddling files per run
    // -> worst case 24/64. (The 1-D contrast below reads ~100%.)
    assert(za <= zn * 2 / 5, s"a-predicate touched $za of $zn z-ordered files")
    assert(zb <= zn * 2 / 5, s"b-predicate touched $zb of $zn z-ordered files")

    // contrast: range-sort on `a` alone prunes a but leaves every file
    // spanning the full b domain — the 2-D claim fails without Morton
    val rdir = tmpDir("graft_zorder_1d") + "/t"
    commitBase(rdir)
    assert(Clustering.cluster(spark, rdir, Seq(col("a")), files = 16).contains(0L))
    val (ra, rn) = touched(rdir, "a")
    val (rb, _) = touched(rdir, "b")
    assert(ra <= rn / 3 + 1, s"a-predicate touched $ra of $rn a-sorted files")
    assert(rb >= rn * 9 / 10, s"b-predicate should touch ~all a-sorted files, got $rb of $rn")
  }

  test("a later COW commit supersedes the clustered copy; retention matches COW") {
    val dir = tmpDir("graft_cluster2") + "/t"
    mkTable(dir)
    Clustering.cluster(spark, dir, Seq(col("id")), files = 2)
    // new batch: one upsert row, folded in through the same service
    val upd = Ingest.readSnapshot(spark, dir).get.limit(1)
      .select(col("id"), (col("lsn") + 1000000).as("lsn"), lit("u").as("op"),
        (col("value") * 0).as("value"))
    MergeOnRead.logAppend(spark, dir, upd, 1L)
    MergeOnRead.compact(spark, dir, Seq("id"), Seq("lsn"))
    // pointer moved to the raw v1; stale c0 not consulted
    assert(Clustering.baseDir(spark, dir).get.endsWith("/v1"))
    assert(Clustering.clusteredId(spark, dir).isEmpty)
    val before = Ingest.readSnapshot(spark, dir).get.orderBy("id", "lsn").collect()
    // reclustering the new base re-points; the OLD clustered copy is
    // RETAINED while its base version is (in-flight readers that
    // resolved c0 keep working — same retention window as COW GC)
    assert(Clustering.cluster(spark, dir, Seq(col("id")), files = 2).contains(1L))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/c0")),
      "clustered copy of a retained base version must survive GC")
    assert(Clustering.baseDir(spark, dir).get.endsWith("/c1"))
    assert(Ingest.readSnapshot(spark, dir).get.orderBy("id", "lsn").collect().toSeq == before.toSeq)
  }
}
