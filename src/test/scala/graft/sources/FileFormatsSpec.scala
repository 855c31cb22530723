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
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ff").toString

  test("hostile text round-trips byte-exactly through JSON and CSV") {
    import spark.implicits._
    val rows = Seq(
      (1L, """comma, "quoted", more""", "en", "web", 21L),
      (2L, """back\slash and "dq" and 'sq' and tab\there""", "de", "book", 42L),
      (3L, "", "fr", "web", 0L), // empty text
      (4L, " leading and trailing ", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = tmp()
    FileFormats.writeJson(rows, base + "/j")
    FileFormats.writeCsv(rows, base + "/c")
    val truth = rows.orderBy("doc_id").collect().toSeq
    val j = FileFormats.readJson(spark, base + "/j").orderBy("doc_id").collect().toSeq
    val c = FileFormats.readCsv(spark, base + "/c").orderBy("doc_id").collect().toSeq
    assert(j.map(_.toSeq) == truth.map(_.toSeq))
    // CSV cannot distinguish empty string from null (documented
    // format limit); normalize that one cell before comparing
    val cNorm = c.map(_.toSeq.map(v => if (v == null) "" else v))
    assert(cNorm == truth.map(_.toSeq))
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
