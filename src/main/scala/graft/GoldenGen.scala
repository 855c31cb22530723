package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Refreshes the QueriesSpec golden row-count resource: every declared
  * query run at sf0.001, counts written as one flat JSON object to
  * `src/test/resources/golden_sf0.001.json` — the ONE source of truth
  * the spec loads. The declared-vs-golden sync test stays the tripwire:
  * a query added without regenerating (or regenerated without being
  * declared) still fails the suite, but the counts themselves can no
  * longer drift from a hand-maintained copy. Regenerate ONLY from an
  * oracle-green tree — blindly refreshing over a semantic regression
  * would bless it; the driver's DuckDB gate remains the value-level
  * check that catches that.
  *
  * Usage: `sbt "runMain graft.GoldenGen"` (optional args: sfDir outPath).
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("src/test/resources/golden_sf0.001.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir).count()
    }
    val json = counts.map { case (n, c) => s"""  "$n": $c""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${counts.size} golden counts to $out")
    spark.stop()
  }
}
