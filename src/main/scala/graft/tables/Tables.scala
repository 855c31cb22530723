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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Declaring the column BIGINT
    * in the read schema makes the reader hand over the raw epoch-nanos
    * int64 (scoped to this read — no session-wide `nanosAsLong`
    * mutation); truncating to microseconds matches DuckDB's ns→µs
    * truncation exactly, so oracle comparisons line up. */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(p(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
