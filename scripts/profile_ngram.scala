import org.apache.spark.sql.functions._
import graft.queries.GQuery

def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

val q = GQuery.all.find(_.name == "q_win_analytic").get
val df = q.fn(spark, "/root/testdata/sf0.1")
time("win_analytic cold")(df.count())
time("win_analytic warm")(df.count())
println(df.queryExecution.executedPlan.treeString.split("\n").map(_.take(120)).take(20).mkString("\n"))
val q2 = GQuery.all.find(_.name == "q_dedup_exact").get
val df2 = q2.fn(spark, "/root/testdata/sf0.1")
time("dedup_exact warm")(df2.count())
System.exit(0)
