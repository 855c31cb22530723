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
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as epoch-nanos long
    * (`nanosAsLong`) and truncate to microseconds — identical to DuckDB's
    * ns→µs truncation, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(p(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
