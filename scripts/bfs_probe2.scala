// Edges-build variants for q_graph_bfs: the self-join + distinct
// (shipped) vs groupBy-collect_set + pair explosion + distinct
// (one ok-shuffle instead of two join-side shuffles).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.tables.Tables

val dir = "/root/testdata/sf0.1"

def li(): DataFrame = {
  Tables.lineitem(spark, dir)
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
}

def edgesJoin(): DataFrame = {
  val l = li()
  l.select(col("ok"), col("pk").as("src"))
    .join(l.select(col("ok"), col("pk").as("dst")), "ok")
    .filter(col("src") =!= col("dst"))
    .select(col("src"), col("dst")).distinct()
}

def edgesGrouped(): DataFrame = {
  li().groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
    .select(explode(expr(
      "flatten(transform(ps, x -> transform(filter(ps, y -> y != x), " +
        "y -> struct(x AS src, y AS dst))))")).as("p"))
    .select(col("p.src").as("src"), col("p.dst").as("dst")).distinct()
}

def time(label: String, mk: => DataFrame): Unit = {
  val ts = (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    mk.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"$label%-18s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
}

// equality check first
val a = edgesJoin().count(); val b = edgesGrouped().count()
println(s"counts join=$a grouped=$b equal=${a == b}")
time("edges_join", edgesJoin())
time("edges_grouped", edgesGrouped())
time("edges_join_2", edgesJoin())
time("edges_grouped_2", edgesGrouped())
System.exit(0)
