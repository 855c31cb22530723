package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcGen

/** Source/sink format breadth: the engine's tables round-trip through
  * every bundled columnar/text format with schema and values intact.
  * (Kafka is file-emulated — IngestStreamSpec; Avro is intentionally
  * out: no spark-avro module jar in the environment, SURVEY §2.1 S15.)
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val snap = CdcGen.expectedSnapshot(spark, 50).cache()

  private def roundTrip(fmt: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = tmpDir(s"graft_fmt_$fmt")
    snap.write.options(opts).format(fmt).mode("overwrite").save(dir)
    val back = spark.read.options(opts ++ Map("inferSchema" -> "true")).format(fmt).load(dir)
    assert(back.count() == snap.count(), fmt)
    val a = snap.select("id", "full_name", "salary").as[(Int, String, Int)]
      .collect().sortBy(_._1).toSeq
    val b = back.select(col("id").cast("int"), col("full_name"), col("salary").cast("int"))
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(a == b, fmt)
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(roundTrip("csv", Map("header" -> "true")))

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmpDir("graft_fmt_part")
    snap.write.partitionBy("department").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter($"department" === "IT")
    val scan = one.queryExecution.executedPlan.treeString
    // partition filter applied at the source, not as a post-scan filter
    assert(scan.contains("PartitionFilters: [isnotnull(department"), scan)
    assert(one.count() > 0)
  }
}
