package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the multi-format source contract: byte-exact round-trips for
  * hostile text through both formats, and the poison-record path — a
  * corrupt JSON line must surface as a capturable row (the batch twin
  * of the streaming DLQ in Ingest.withDeadLetters), never kill the
  * scan, and never silently vanish. */
class FileFormatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ff").toString

  test("hostile text round-trips byte-exactly through JSON, CSV and ORC — including NULL vs ''") {
    import spark.implicits._
    val rows = Seq(
      (1L, """comma, "quoted", more""", "en", "web", 21L),
      (2L, """back\slash and "dq" and 'sq' and tab\there""", "de", "book", 42L),
      (3L, "", "fr", "web", 0L),   // empty text: must stay '', not NULL
      (4L, " leading and trailing ", "en", "web", 22L),
      (5L, null, "en", "web", 0L)) // NULL text: must stay NULL, not ''
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = tmp()
    FileFormats.writeJson(rows, base + "/j")
    FileFormats.writeCsv(rows, base + "/c")
    FileFormats.writeOrc(rows, base + "/o")
    val truth = rows.orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val j = FileFormats.readJson(spark, base + "/j").orderBy("doc_id").collect().toSeq
    val c = FileFormats.readCsv(spark, base + "/c").orderBy("doc_id").collect().toSeq
    val o = FileFormats.readOrc(spark, base + "/o").orderBy("doc_id").collect().toSeq
    assert(j.map(_.toSeq) == truth)
    assert(c.map(_.toSeq) == truth)
    assert(o.map(_.toSeq) == truth)
  }

  test("CSV null sentinel is reserved: a literal \\N VALUE reads back as NULL (documented limit)") {
    import spark.implicits._
    // univocity matches nullValue AFTER unquoting, so even the quoted
    // "\N" collapses to NULL — no sentinel escapes this; the format
    // contract reserves the token (FileFormats scaladoc). Pin it so a
    // behavior change surfaces here instead of in an oracle mismatch.
    val rows = Seq((1L, "\\N", "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmp() + "/sentinel"
    FileFormats.writeCsv(rows, dir)
    val back = FileFormats.readCsv(spark, dir).collect()
    assert(back.length == 1 && back(0).isNullAt(1))
  }

  test("newline-bearing text is rejected at CSV write time, not corrupted") {
    import spark.implicits._
    val rows = Seq((1L, "line one\nline two", "en", "web", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      FileFormats.writeCsv(rows, tmp() + "/bad")
    }
    assert(e.getMessage.contains("newline"))
    // carriage returns too
    val rows2 = Seq((1L, "cr\rhere", "en", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    intercept[IllegalArgumentException] {
      FileFormats.writeCsv(rows2, tmp() + "/bad2")
    }
  }

  test("corrupt JSON rows land in the corrupt-record column, valid rows parse") {
    import spark.implicits._
    val dir = tmp() + "/poison"
    val lines = Seq(
      """{"doc_id": 1, "text": "good", "lang": "en", "source": "web", "n_chars": 4}""",
      """{"doc_id": broken not json""",
      """{"doc_id": 2, "text": "also good", "lang": "de", "source": "book", "n_chars": 9}""")
    spark.createDataset(lines).coalesce(1).write.text(dir)
    val out = spark.read
      .schema(FileFormats.docSchema + ", _corrupt STRING")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .cache() // PERMISSIVE corrupt-column reads require materialization
    assert(out.count() == 3)
    assert(out.filter(col("_corrupt").isNotNull).count() == 1)
    assert(out.filter(col("_corrupt").isNull).select(sum(col("n_chars"))).head.getLong(0) == 13L)
  }
}
