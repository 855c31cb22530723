// PageRank convergence probe: L1 residual Σ|rank_r − rank_{r−1}| (1e9
// grid) per round on the REAL corpus near-dup graph at sf0.1 — the
// evidence behind q_graph_pagerank's fixed rounds=5 and ops.Graph's
// default. Run: spark-shell --driver-class-path target/scala-2.13/classes \
//        -I scripts/pagerank_residual_probe.scala
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.ops.Graph

val dir = "/root/testdata/sf0.1"
val pairs = SparkEntry.queries("q_dedup_ngram")(spark, dir)
  .select(col("id_a"), col("id_b")).localCheckpoint()
val n = pairs.count()
println(s"corpus near-dup graph: $n pairs")
for (r <- 2 to 6) {
  val res = Graph.pagerankResidual(pairs, r)
  println(f"| round ${r - 1}%d -> $r%d | L1 residual $res%d (grid 1e9) |")
}
System.exit(0)
