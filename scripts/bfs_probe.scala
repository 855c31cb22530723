// q_graph_bfs probe: per-level localCheckpoint (shipped) vs one lazy
// DAG (no level checkpoints, exchange-reuse dependent) vs keeping only
// the edges checkpoint. Times at sf0.1, min of 3 each, noop sink.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.tables.Tables

val dir = "/root/testdata/sf0.1"

def edgesOf(): DataFrame = {
  val li = Tables.lineitem(spark, dir)
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
  li.select(col("ok"), col("pk").as("src"))
    .join(li.select(col("ok"), col("pk").as("dst")), "ok")
    .filter(col("src") =!= col("dst"))
    .select(col("src"), col("dst")).distinct().localCheckpoint()
}

def bfs(checkLevels: Boolean): DataFrame = {
  val li = Tables.lineitem(spark, dir)
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
  val edges = edgesOf()
  def mat(df: DataFrame): DataFrame = if (checkLevels) df.localCheckpoint() else df
  var levels = List(mat(li.agg(min(col("pk")).as("pk")).withColumn("depth", lit(0))))
  for (d <- 1 to 3) {
    val frontier = levels.head.select(col("pk"))
    val visitedKeys = levels.map(_.select(col("pk"))).reduce(_.union(_))
    val next = mat(frontier.join(edges, frontier("pk") === edges("src"))
      .select(col("dst").as("pk")).distinct()
      .join(visitedKeys, Seq("pk"), "left_anti")
      .withColumn("depth", lit(d)))
    levels ::= next
  }
  levels.reduce(_.unionByName(_)).groupBy(col("depth"))
    .agg(count(lit(1)).as("n"), min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"))
    .orderBy(col("depth"))
}

def time(label: String, mk: => DataFrame): Unit = {
  val ts = (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    mk.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"$label%-22s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
}

// edges-build cost alone, for attribution
time("edges_only", edgesOf().limit(1).toDF())
time("bfs_checkpointed", bfs(true))
time("bfs_lazy_levels", bfs(false))
time("bfs_checkpointed_2", bfs(true))
time("bfs_lazy_levels_2", bfs(false))
System.exit(0)
