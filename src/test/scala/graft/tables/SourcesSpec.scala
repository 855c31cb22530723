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

  // Fixture-format tripwire (VERDICT r12): the driver regenerated
  // /root/testdata with events.ts as TIMESTAMP(MICROS) while the loader
  // still decoded BIGINT-nanos ÷ 1000, silently compressing the 30-day
  // fixture to ~43 minutes and flipping 14 oracle queries red. These
  // assertions fail loudly at test time if the encoding flips again.
  test("events.ts tripwire: decoded as TimestampType with a days-scale span") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"Tables.events must normalize ts to TIMESTAMP, got ${ev.schema("ts").dataType}")
    val (lo, hi, n) = ev
      .agg(min(unix_timestamp($"ts")), max(unix_timestamp($"ts")), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(n > 0, "events fixture is empty")
    val spanDays = (hi - lo) / 86400.0
    // the fixture spans ~30 days; a unit-decode bug (ns↔µs↔ms) shifts the
    // span by 1000× in one direction or the other — both sides trip
    assert(spanDays > 2.0, f"events time span collapsed to $spanDays%.4f days — unit-decode bug (r12 failure mode)")
    assert(spanDays < 3650.0, f"events time span inflated to $spanDays%.1f days — unit-decode bug")
    // and the epoch must be in a plausible modern range (catches raw-nanos
    // read as seconds/micros without conversion)
    assert(lo > 946684800L && hi < 4102444800L, // 2000-01-01 .. 2100-01-01
      s"events epoch range [$lo, $hi] outside 2000..2100 — wrong epoch unit")
  }

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
