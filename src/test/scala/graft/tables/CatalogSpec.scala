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
}
