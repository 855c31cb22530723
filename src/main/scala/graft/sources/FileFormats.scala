package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** Multi-format batch sources beyond parquet: JSON-lines, CSV and ORC
  * with DECLARED schemas. Schema inference is a second full pass over
  * the source — at 100 TB the production reader always declares, so
  * these readers take the schema as a contract and never infer (the
  * streaming twin of the same rule is Ingest's declared-envelope fast
  * path). The reference's only non-parquet format is the JSON it
  * ingests from Kafka (reference README.md:170-204); these are the
  * batch-file equivalents, and the q_source_* queries gate reader
  * fidelity against the parquet truth through the DuckDB oracle
  * (round-trip identity: parquet -> format -> reader == parquet).
  *
  * CSV is written quoteAll + escape-doubled so arbitrary document text
  * (commas, quotes) round-trips. NULL cells are written as the
  * unquoted `\N` sentinel (the Hive convention) and empty strings as
  * quoted `""`, so the reader can tell them apart — with the default
  * options both write as the empty field and every NULL silently reads
  * back as ''. Embedded NEWLINES are rejected at write time (fail
  * fast, never corrupt): they would require multiLine=true, which
  * makes the read non-splittable (one task per file). The production
  * answer for newline-bearing text is JSON-lines (or ORC/parquet),
  * where escaping keeps every record one physical line and the scan
  * stays splittable.
  */
object FileFormats {

  /** The documents table contract, declared once. */
  val docSchema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** NULL sentinel (the Hive convention). RESERVED TOKEN of this CSV
    * dialect: univocity matches nullValue after unquoting, so a real
    * string value equal to the sentinel reads back as NULL even when
    * quoted — FileFormatsSpec pins this documented limit. Data whose
    * text can legitimately be `\N` belongs in JSON-lines/ORC/parquet. */
  private val CsvNull = "\\N"

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.schema(docSchema).json(path)

  /** CSV write with the newline-rejection precheck. COST NOTE: the
    * precheck is a SECOND evaluation of the input plan (LocalLimit
    * stops at the first offender, but a clean input pays a full extra
    * pass) and check-then-write is not atomic for non-deterministic
    * sources. Acceptable for the fixture-scale inputs this path
    * serves; a production-sized export should materialize once
    * (cache/checkpoint or write-then-validate) before routing here. */
  def writeCsv(df: DataFrame, path: String): Unit = {
    // fail fast on the documented format limit instead of writing rows
    // that read back split in two: one early-out scan over the string
    // columns (LocalLimit stops at the first offender)
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.nonEmpty) {
      val bad = df
        .filter(strCols.map(c => col(c).rlike("[\\n\\r]")).reduce(_ || _))
        .limit(1).count()
      require(bad == 0,
        "writeCsv: newline-bearing text is unsupported in the splittable " +
          "CSV path — route such corpora through JSON-lines or ORC/parquet")
    }
    df.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      // the CSV WRITER trims cell whitespace by default (ignore*WhiteSpace
      // default true on write, false on read) — silent data corruption for
      // text payloads; FileFormatsSpec pins the round-trip
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      // NULL vs '' disambiguation: nulls write as unquoted \N, empties
      // as quoted "" (emptyValue default); reader mirrors both
      .option("nullValue", CsvNull)
      .csv(path)
  }

  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.schema(docSchema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("nullValue", CsvNull)
      .option("emptyValue", "")
      .csv(path)

  /** ORC: the columnar alternate the warehouse world actually runs —
    * typed, splittable, predicate-pushdown-capable; text round-trips
    * byte-exactly with no quoting/escaping caveats at all. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.schema(docSchema).orc(path)
}
