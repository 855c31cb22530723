package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated analytic tables
  * (TESTDATA.md / FIXTURES.md §C). One place owns schema quirks so every
  * operator sees the same canonical shape.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so downstream operators should
  * `select`/`filter` early and let pushdown do the work. On a real
  * cluster the same code reads partitioned/bucketed layouts unchanged.
  */
object Tables {

  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "lineitem"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))

  /** `events.ts` encoding has changed across fixture generations (see
    * FIXTURES.md): currently parquet TIMESTAMP(MICROS, isAdjustedToUTC
    * =false), which Spark infers as TIMESTAMP_NTZ; earlier fixtures used
    * TIMESTAMP(NANOS), which Spark's reader rejects outright
    * ([PARQUET_TYPE_ILLEGAL]). This loader reads whatever is there and
    * normalizes `ts` to TimestampType (session tz is UTC everywhere, so
    * the NTZ cast is wall-clock- and epoch-identical to DuckDB's naive
    * read of the same file):
    *   - TIMESTAMP/TIMESTAMP_NTZ: read natively, cast NTZ → TIMESTAMP.
    *   - TIMESTAMP(NANOS): the schema-conversion error is caught and the
    *     column re-read as BIGINT (scoped to this read — no session-wide
    *     `nanosAsLong` mutation), then truncated ns → µs, matching
    *     DuckDB's truncation exactly.
    * SourcesSpec carries a tripwire asserting the decoded time span is
    * days-scale so a future encoding flip can't silently compress event
    * time again (the r12 failure mode). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = p(dir, "events")
    try {
      val df = spark.read.parquet(path)
      df.schema("ts").dataType match {
        case TimestampType    => df
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case other =>
          throw new IllegalStateException(s"events.ts has unsupported type $other — extend Tables.events")
      }
    } catch {
      // Legacy TIMESTAMP(NANOS) fixtures: schema conversion throws before any
      // data is read; re-read with ts declared BIGINT to get raw epoch-nanos.
      case e: org.apache.spark.sql.AnalysisException if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") =>
        spark.read
          .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
          .parquet(path)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    }
  }
}
