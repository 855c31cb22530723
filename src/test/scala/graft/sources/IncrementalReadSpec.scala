package graft.sources

import graft.SparkSpec
import graft.cdc.FileGroups
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** `spark.read.option("startingVersion", v).table(...)` on file-group
  * catalog tables: Hudi's incremental-query read option — the current
  * snapshot's rows upserted after retained version v, same schema as
  * the table, lowered to an ord-threshold filter over ONLY the file
  * groups rewritten since v. */
class IncrementalReadSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def log() = Tables.events(spark, sf).select(
    col("user_id").as("id"), col("event_id").as("lsn"),
    when(pmod(col("event_id"), lit(11)) === 0, "d")
      .when(pmod(col("event_id"), lit(3)) === 0, "u")
      .otherwise("c").as("op"),
    col("value"))

  private def mkTable(name: String): String = {
    val root = tmpDir("graft_incr")
    val t = root + "/employees"
    val l = log()
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 8)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set(s"spark.sql.catalog.$name", classOf[FileGroupCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    t
  }

  test("startingVersion returns exactly the rows upserted after v (diff-oracled)") {
    val t = mkTable("graft_incr1")
    val got = spark.read.option("startingVersion", 0)
      .table("graft_incr1.employees")
      .select($"id", $"lsn", $"op", $"value").orderBy($"id").collect().toSeq
    // the oracle: the TVF-layer diff's insert/update post-images,
    // joined back to the head snapshot for the full row image
    val changed = graft.cdc.ChangeFeed.diff(
        FileGroups.readAt(spark, t, 0L).get, FileGroups.readAt(spark, t, 1L).get,
        Seq("id"), "lsn", Seq("op", "value"))
      .filter($"change_op".isin("i", "u"))
      .select($"id", $"after_lsn".as("lsn"), $"after_op".as("op"),
        $"after_value".as("value"))
      .orderBy($"id").collect().toSeq
    assert(got.nonEmpty && got == changed)
    // the option composes like any relation: further filters/aggregates
    val n = spark.read.option("startingVersion", 0)
      .table("graft_incr1.employees").filter($"op" === "u").count()
    assert(n == changed.count(_.getString(2) == "u") && n > 0)
    // startingVersion = head is an empty increment, not an error
    assert(spark.read.option("startingVersion", 1)
      .table("graft_incr1.employees").count() == 0)
  }

  test("incremental file cut: only file groups rewritten after v reach the scan") {
    // second commit touches ONE key → one bucket of 8 rewritten; the
    // incremental scan must read only that bucket's new file, never
    // the 7 carried-forward groups (the 100 TB property: cost ∝
    // changed buckets, not table size)
    val root = tmpDir("graft_incr_cut")
    val t = root + "/employees"
    FileGroups.commit(spark, t, log().filter($"op" =!= "d"), 0L,
      Seq("id"), Seq("lsn"), nBuckets = 8)
    FileGroups.commit(spark, t,
      Seq((1L, 100000L, "u", 9.9)).toDF("id", "lsn", "op", "value"),
      1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_incr2", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_incr2.root", root)

    def scanFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.toSeq
      }.flatten
    val df = spark.read.option("startingVersion", 0).table("graft_incr2.employees")
    val scanned = scanFiles(df)
    val fullScan = scanFiles(spark.read.table("graft_incr2.employees"))
    assert(scanned.nonEmpty && scanned.size < fullScan.size,
      s"incremental scan must cut files: ${scanned.size} vs full ${fullScan.size}")
    // every scanned file is a v1 rewrite — no carried-forward group
    assert(scanned.forall(_.contains("/v1/")), scanned.mkString(","))
    // and the values are right: exactly the one upserted row
    val got = df.select($"id", $"lsn").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100000L)), got.toString)
  }

  test("the threshold is manifest metadata on r19 tables; stripped headers fall back to the scan") {
    // fresh commits write the #ordhi ceiling: the changed-since
    // threshold is a LITERAL from one manifest line — the plan carries
    // NO subquery and no scan of the base version (at 100 TB: zero
    // data IO for the threshold)
    val root = tmpDir("graft_incr_hdr")
    val t = root + "/employees"
    val l = log()
    FileGroups.commit(spark, t, l.filter($"lsn" < 500), 0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 500), 1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_incr7", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_incr7.root", root)
    def subqueries(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collectWithSubqueries {
        case p => p.expressions.flatMap(_.collect {
          case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
        }).size
      }.sum
    def read() = spark.read.option("startingVersion", 0)
      .table("graft_incr7.employees").select($"id", $"lsn").orderBy($"id")
    val fast = read()
    assert(subqueries(fast) == 0, "r19 tables must take the metadata threshold")
    val want = fast.collect().toSeq
    assert(want.nonEmpty)

    // strip the header (a pre-r19 manifest): same values through the
    // scalar-subquery fallback — compatibility is behavioral, not
    // parse-only
    // rewrite through the Hadoop FS (the writer's door) so the
    // checksum sidecar stays consistent with the edited bytes
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(s"$t/manifest_v0.tsv")
    val in = fs.open(mf)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val stripped = text.split("\n").filterNot(_.startsWith("#ordhi=")).mkString("\n")
    val out = fs.create(mf, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    val slow = read()
    assert(subqueries(slow) > 0, "header-less manifests must fall back to the ord scan")
    assert(slow.collect().toSeq == want)
  }

  test("key probes intersect the incremental cut — they never resurrect an excluded group") {
    // a record-key equality predicate on an incremental read: the
    // probe pruning (bucket+bloom) must INTERSECT the changed-group
    // cut, not replace it — a probe admitting a bucket the incremental
    // cut excluded would re-read carried-forward files for nothing
    val root = tmpDir("graft_incr_probe")
    val t = root + "/employees"
    FileGroups.commit(spark, t, log().filter($"op" =!= "d"), 0L,
      Seq("id"), Seq("lsn"), nBuckets = 8)
    // v1 touches only key 1; key 2 lives in a carried-forward group
    FileGroups.commit(spark, t,
      Seq((1L, 100000L, "u", 9.9)).toDF("id", "lsn", "op", "value"),
      1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_incr6", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_incr6.root", root)

    def scanFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.toSeq
      }.flatten

    // probed key IS the changed one: scan stays within the v1 rewrite
    val hit = spark.read.option("startingVersion", 0)
      .table("graft_incr6.employees").where($"id" === 1L)
    assert(scanFiles(hit).nonEmpty && scanFiles(hit).forall(_.contains("/v1/")))
    assert(hit.select($"lsn").as[Long].collect().toSeq == Seq(100000L))

    // probed key lives ONLY in a carried-forward group: the intersect
    // empties the scan — zero files read, zero rows, still correct
    val miss = spark.read.option("startingVersion", 0)
      .table("graft_incr6.employees").where($"id" === 2L)
    assert(scanFiles(miss).isEmpty, scanFiles(miss).mkString(","))
    assert(miss.count() == 0)
  }

  test("startingVersion composes with Spark's versionAsOf option: a bounded version range") {
    // spark.read.option("versionAsOf", N) is core Spark 4 time travel
    // (spark.sql.timeTravelVersionKey) — it pins the HEAD the rule
    // diffs against, so (startingVersion=a, versionAsOf=b) reads the
    // rows upserted in (a, b] — the TVF's bounded range through pure
    // read options, no SQL required
    val root = tmpDir("graft_incr_range")
    val t = root + "/employees"
    val l = log()
    graft.cdc.FileGroups.setRetention(spark, t, 4) // keep all three versions
    FileGroups.commit(spark, t, l.filter($"lsn" < 300), 0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 300 && $"lsn" < 600), 1L, Seq("id"), Seq("lsn"))
    FileGroups.commit(spark, t, l.filter($"lsn" >= 600), 2L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_incr5", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_incr5.root", root)

    val got = spark.read
      .option("versionAsOf", 1).option("startingVersion", 0)
      .table("graft_incr5.employees")
      .select($"id", $"lsn").orderBy($"id").collect().toSeq
    val want = graft.cdc.ChangeFeed.diff(
        FileGroups.readAt(spark, t, 0L).get, FileGroups.readAt(spark, t, 1L).get,
        Seq("id"), "lsn", Seq("op", "value"))
      .filter($"change_op".isin("i", "u"))
      .select($"id", $"after_lsn".as("lsn"))
      .orderBy($"id").collect().toSeq
    assert(got.nonEmpty && got == want)
    // the bound is real: the range read's post-images are all from the
    // v1 era (lsn < 600), while the unbounded read serves the v2 tail
    assert(got.forall(_.getLong(1) < 600), got.toString)
    val unboundedMax = spark.read.option("startingVersion", 0)
      .table("graft_incr5.employees")
      .agg(org.apache.spark.sql.functions.max($"lsn")).head().getLong(0)
    assert(unboundedMax >= 600, unboundedMax.toString)
  }

  test("an all-deleted base version means everything has changed since") {
    val root = tmpDir("graft_incr_empty")
    val t = root + "/employees"
    // v0: one delete of a key that never existed → an EMPTY snapshot
    FileGroups.commit(spark, t,
      Seq((999999L, 1L, "d", 0.0)).toDF("id", "lsn", "op", "value"),
      0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    FileGroups.commit(spark, t,
      Seq((1L, 10L, "c", 1.0), (2L, 11L, "c", 2.0)).toDF("id", "lsn", "op", "value"),
      1L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_incr3", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_incr3.root", root)
    val got = spark.read.option("startingVersion", 0)
      .table("graft_incr3.employees")
      .select($"id").orderBy($"id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L), got.toString)
  }

  test("aged-out, future and malformed startingVersion fail loudly") {
    val root = tmpDir("graft_incr_bad")
    val t = root + "/employees"
    val l = log()
    // three commits at default retention 2 → v0 is GC'd
    FileGroups.commit(spark, t, l.filter($"lsn" < 300), 0L, Seq("id"), Seq("lsn"), nBuckets = 4)
    FileGroups.commit(spark, t, l.filter($"lsn" >= 300 && $"lsn" < 600), 1L, Seq("id"), Seq("lsn"))
    FileGroups.commit(spark, t, l.filter($"lsn" >= 600), 2L, Seq("id"), Seq("lsn"))
    spark.conf.set("spark.sql.catalog.graft_incr4", classOf[FileGroupCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_incr4.root", root)

    val aged = intercept[Exception] {
      spark.read.option("startingVersion", 0).table("graft_incr4.employees").collect()
    }
    assert(aged.getMessage.contains("re-bootstrap"), aged.getMessage)
    val future = intercept[Exception] {
      spark.read.option("startingVersion", 99).table("graft_incr4.employees").collect()
    }
    assert(future.getMessage.contains("beyond the read version"), future.getMessage)
    val mangled = intercept[Exception] {
      spark.read.option("startingVersion", "one").table("graft_incr4.employees").collect()
    }
    assert(mangled.getMessage.contains("must be an integer"), mangled.getMessage)
  }

  test("an UNCONSUMED startingVersion (no extensions) fails loudly, never a full snapshot") {
    // startingVersion is consumed by IncrementalReadRule, which lives
    // in GraftExtensions; a session that registered the catalog via
    // spark.sql.catalog.* conf WITHOUT the extensions would otherwise
    // silently get the FULL snapshot served as an "increment" (the r19
    // advice finding). The guard sits at newScanBuilder — the rule
    // strips the option, so only the no-extensions path can reach it.
    // Exercised directly against the table (this suite's session HAS
    // the extensions, so the SQL path can't demonstrate the miss):
    val t = mkTable("graft_incr5")
    val committed = FileGroups.committedId(spark, t).get
    val table = new FileGroupTable(spark, "graft_incr5.employees", t, committed,
      Seq("id"), Seq("lsn"))
    val ex = intercept[IllegalStateException] {
      table.newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("startingVersion", "0")))
    }
    assert(ex.getMessage.contains("GraftExtensions"), ex.getMessage)
    // and the extension path (this session) still strips it before the
    // scan builder — the guard never fires on a correctly-built session
    assert(spark.read.option("startingVersion", 0)
      .table("graft_incr5.employees").count() > 0)
  }
}
