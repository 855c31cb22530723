package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest SF: pays the one-time JIT/codegen/
    // planner costs so per-query timings measure the queries, not JVM
    // cold start (standard benchmarking practice).
    val warm = Seq("q_agg_hash", "q_win_analytic", "q_dedup_ngram", "q_join_broadcast")
    warm.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Each query timed twice, min reported: a single local-JVM run is
    // exposed to one-off GC/compilation stalls that can inflate one
    // query's number 20x (observed: 1.2s query recorded as 32s); min-of-2
    // measures the query, not the stall. A failed query is reported
    // explicitly in `errors` (never silently timed as if it ran).
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200))
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = once(name, fn) match {
        case Right(t1) => once(name, fn).map(t2 => math.min(t1, t2))
        case left => left
      }
      name -> r
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\r", " ").replace("\t", " ")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => s"\"${k}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    val nErr = results.count(_._2.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"n_errors":$nErr,"timing":"min_of_2","sf":"$sfDir"}""")
    spark.stop()
  }
}
