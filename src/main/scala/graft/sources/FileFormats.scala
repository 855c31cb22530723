package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-format batch sources beyond parquet: JSON-lines and CSV with
  * DECLARED schemas. Schema inference is a second full pass over the
  * source — at 100 TB the production reader always declares, so these
  * readers take the schema as a contract and never infer (the
  * streaming twin of the same rule is Ingest's declared-envelope fast
  * path). The reference's only non-parquet format is the JSON it
  * ingests from Kafka (reference README.md:170-204); these are the
  * batch-file equivalents, and the q_source_* queries gate reader
  * fidelity against the parquet truth through the DuckDB oracle
  * (round-trip identity: parquet -> format -> reader == parquet).
  *
  * CSV is written quoteAll + escape-doubled so arbitrary document text
  * (commas, quotes) round-trips; embedded NEWLINES are the documented
  * limit — they would require multiLine=true, which makes the read
  * non-splittable (one task per file). The production answer for
  * newline-bearing text is JSON-lines, where escaping keeps every
  * record one physical line and the scan stays splittable.
  */
object FileFormats {

  /** The documents table contract, declared once. */
  val docSchema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.schema(docSchema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      // the CSV WRITER trims cell whitespace by default (ignore*WhiteSpace
      // default true on write, false on read) — silent data corruption for
      // text payloads; FileFormatsSpec pins the round-trip
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.schema(docSchema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)
}
