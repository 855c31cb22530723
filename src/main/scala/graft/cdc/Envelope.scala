package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Debezium change-event envelope as a declared Spark schema.
  *
  * Shape per reference README.md:179-185 (navigated as
  * `json.payload.after.*`) and FIXTURES.md §B: `{schema, payload:
  * {before, after, source{...}, op ∈ {c,u,d,r}, ts_ms}}`. The reference
  * re-infers this schema on every micro-batch (README.md:179 —
  * `spark.read.json(df.rdd.map(...)).schema`); we support that dynamic
  * path (see [[Ingest.inferEnvelopeSchema]]) but default to this declared
  * constant, which removes one full batch scan per trigger (SURVEY.md §4,
  * "JSON parse efficiency").
  */
object Envelope {

  /** Post-image row schema for the reference's `employees` table
    * (table_structure.png; generator.py:25-34). `created_at` arrives as
    * int32 epoch-days — Debezium `io.debezium.time.Date` default. */
  val employees: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("full_name", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("department", StringType),
    StructField("salary", IntegerType),
    StructField("created_at", IntegerType)))

  val source: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType)))

  /** Full envelope for a given row schema (before/after share it). */
  def envelope(row: StructType): StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", row),
      StructField("after", row),
      StructField("source", source),
      StructField("op", StringType),
      StructField("ts_ms", LongType))))))

  val employeesEnvelope: StructType = envelope(employees)

  /** Emulated Kafka record schema — byte-compatible with the real
    * spark-sql-kafka source's output (FIXTURES.md §B) so the reference's
    * `CAST(value AS STRING)` projections (README.md:195, 335) port
    * unchanged if a real Kafka jar appears. */
  val kafkaRecord: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Debezium epoch-days int → DateType (FIXTURES.md §A `created_at`). */
  def epochDaysToDate(c: Column): Column = date_add(lit("1970-01-01").cast("date"), c)

  val OpCreate = "c"
  val OpUpdate = "u"
  val OpDelete = "d"
  val OpSnapshotRead = "r"
}
