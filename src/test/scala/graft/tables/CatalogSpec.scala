package graft.tables

import graft.SparkSpec
import graft.cdc.{CdcGen, CdcMerge}

/** U7 — the reference's end product is a catalog-registered queryable
  * table (README.md:298-304); verify both managed and external sync. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  // unique names: the in-memory catalog forgets tables across JVMs but
  // their warehouse dirs survive, so a fixed name would collide
  private val run = System.nanoTime()

  test("managed sync: snapshot queryable via spark.table / SQL") {
    val snap = CdcMerge.snapshot(
      Seq((1, 10L, "c", 100), (2, 20L, "c", 200), (1, 30L, "d", 0))
        .toDF("id", "lsn", "op", "salary"),
      Seq("id"), Seq("lsn"))
    Catalog.sync(s"employees_snapshot_$run", snap)
    assert(spark.table(s"employees_snapshot_$run").count() == 1)
    assert(spark.sql(
      s"SELECT salary FROM employees_snapshot_$run WHERE id = 2").as[Int].head() == 200)
  }

  test("external sync: parquet location registered and queryable") {
    val dir = tmpDir("graft_ext")
    CdcGen.expectedSnapshot(spark, 20).write.mode("overwrite").parquet(s"$dir/emp")
    Catalog.syncExternal(spark, s"employees_ext_$run", s"$dir/emp")
    assert(spark.table(s"employees_ext_$run").count() == 20 - 2) // minus id%7
  }

  test("bucketed tables join WITHOUT a shuffle exchange") {
    val emp = CdcGen.expectedSnapshot(spark, 100)
    Catalog.syncBucketed(spark, s"emp_a_$run", emp, 4, Seq("id"))
    Catalog.syncBucketed(spark, s"emp_b_$run", emp.selectExpr("id", "salary AS sal2"), 4, Seq("id"))
    val joined = spark.table(s"emp_a_$run").join(spark.table(s"emp_b_$run"), "id")
    val plan = joined.queryExecution.executedPlan.treeString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be shuffle-free:\n$plan")
    assert(joined.count() == 86)
  }

  test("bucketed sync recovers an orphaned warehouse dir, without pre-deleting") {
    val emp = CdcGen.expectedSnapshot(spark, 30)
    val name = s"emp_orphan_$run"
    // fabricate the failure mode: a managed dir left by a dead JVM whose
    // catalog entry is gone — saveAsTable refuses it with
    // LOCATION_ALREADY_EXISTS unless the sync recovers
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        spark.sessionState.sqlParser.parseTableIdentifier(name)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    fs.create(new org.apache.hadoop.fs.Path(loc, "stale-part.parquet")).close()
    Catalog.syncBucketed(spark, name, emp, 4, Seq("id"))
    assert(spark.table(name).count() == emp.count())

    // and a LIVE table is NOT wiped by a re-sync of a different name
    // sharing the warehouse (the round-9 pre-delete hazard): re-syncing
    // the same name replaces it, but its data was readable throughout
    Catalog.syncBucketed(spark, name, emp.limit(5), 4, Seq("id"))
    assert(spark.table(name).count() == 5)
  }

  test("bucketed sync resolves db-qualified names through the catalog") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftdb_$run")
    val name = s"graftdb_$run.emp_q"
    val emp = CdcGen.expectedSnapshot(spark, 20)
    // orphan the qualified table's real location (under <warehouse>/<db>.db/),
    // where the old warehouse/<name> guess never looked
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        spark.sessionState.sqlParser.parseTableIdentifier(name)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    Catalog.syncBucketed(spark, name, emp, 2, Seq("id"))
    assert(spark.table(name).count() == emp.count())
  }

  test("salted join spreads a hot key and preserves multiplicity") {
    import graft.ops.Skew
    // 1000 rows of one hot key + a small dim side
    val large = spark.range(1000).selectExpr("1 AS k", "id AS payload")
      .union(spark.range(50).selectExpr("2 AS k", "id AS payload"))
    val small = Seq((1, "hot"), (2, "cold")).toDF("k", "label")
    val salted = Skew.saltedJoin(large, small, "k", salt = 8)
    val plain = large.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 1000L), (2, 50L)))
  }
}
