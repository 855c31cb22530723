// Round-21 probe: per-JOB wall breakdown of the CDC SQL lifecycle
// queries (q_cdc_sql_merge and friends) — where do the seconds go?
// Run via spark-shell -I (see gen_plans.sh for the conf).
import org.apache.spark.scheduler._
import scala.collection.mutable.ArrayBuffer

val jobs = ArrayBuffer[(Int, Long, String)]() // (id, ms, description)
val starts = scala.collection.mutable.Map[Int, (Long, String)]()
val listener = new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val desc = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
    val cs = Option(js.properties)
      .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
    starts(js.jobId) = (js.time, if (desc.nonEmpty) desc else cs)
  }
  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    starts.remove(je.jobId).foreach { case (t0, d) =>
      jobs += ((je.jobId, je.time - t0, d)) }
}
spark.sparkContext.addSparkListener(listener)

val dir = "/root/testdata/sf0.1"
val names = sys.env.getOrElse("PROFILE_QS", "q_cdc_sql_merge").split(",").map(_.trim)
names.foreach { name =>
  val q = graft.queries.GQuery.all.find(_.name == name).get
  // warm once (fixture build + codegen), then measure the second run
  q.fn(spark, dir).write.format("noop").mode("overwrite").save()
  spark.catalog.clearCache()
  Thread.sleep(300)
  jobs.clear()
  val t0 = System.nanoTime()
  q.fn(spark, dir).write.format("noop").mode("overwrite").save()
  val wallS = (System.nanoTime() - t0) / 1e9
  spark.catalog.clearCache()
  Thread.sleep(300)
  val byJob = jobs.sortBy(_._1)
  println(f"\n=== ${q.name} warm wall: $wallS%.3f s, jobs: ${jobs.size}, " +
    f"jobSum: ${byJob.map(_._2).sum / 1000.0}%.3f s ===")
  byJob.foreach { case (id, ms, d) => println(f"  job $id%3d  ${ms / 1000.0}%7.3f s  ${d.take(110)}") }
}
System.exit(0)
