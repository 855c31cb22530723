package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** stderr lines for a SPARK_GRAFT_VERIFY_ONLY-filtered run — the two
    * local-iteration guards, pure so VerifySpec can pin them:
    *  - unmatched names warn loudly (a typo'd query id otherwise runs
    *    NOTHING and looks green);
    *  - any filtered run flags the stale-output hazard: other queries'
    *    parquet dirs from a previous full run remain in outDir and
    *    compare.py would re-validate them — use a fresh outDir or pass
    *    the same names to compare.py. */
  def filterDiagnostics(only: Option[Set[String]], known: Set[String],
                        selectedCount: Int, outDir: String): Seq[String] =
    only.toSeq.flatMap { names =>
      val unknown = names -- known
      val warn =
        if (unknown.isEmpty) Nil
        else Seq("[verify] WARNING: SPARK_GRAFT_VERIFY_ONLY names match no query: " +
          unknown.toSeq.sorted.mkString(", "))
      warn :+ s"[verify] NOTE: filtered run ($selectedCount/${known.size} queries); " +
        s"unselected query dirs in $outDir may be stale"
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // analyzer-rule surface (MERGE INTO on graft_cdc tables) is only
      // injectable at session build time
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Run queries on a small thread pool: Spark happily schedules
    // concurrent jobs from multiple threads, and the per-query driver
    // overhead (planning, small-stage latency) dominates at sf0.01 —
    // 4-way concurrency roughly quarters the wall-clock. Results are
    // per-query-deterministic regardless of completion order.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    // Local-iteration filter (the driver never sets it): run only the
    // named queries, e.g. SPARK_GRAFT_VERIFY_ONLY=q_tpch_q1,q_tpch_q6.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    filterDiagnostics(only, SparkEntry.queries.keySet, selected.size, outDir)
      .foreach(System.err.println)
    val tasks = selected.map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
