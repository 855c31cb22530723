// Semantic-dedup quantizer probe: measure the in-cluster candidate-pair
// bound Σ n_c·(n_c−1)/2 as k grows (trained, 3 Lloyd rounds) on the
// sf0.1 embeddings, plus untrained-vs-trained at the oracled k=8.
// Evidence for SCALE.md's "k is the corpus-scale dial" row.
// Run: spark-shell --driver-class-path target/scala-2.13/classes \
//        -I scripts/semantic_k_probe.scala
import graft.ops.Vectors
import graft.tables.Tables

val dir = "/root/testdata/sf0.1"
val emb = Tables.embeddings(spark, dir).cache()
val n = emb.count()
println(s"n = $n vectors; balanced floor n²/2k at k: " +
  Seq(8, 16, 32, 64).map(k => s"$k -> ${n * n / (2 * k)}").mkString(", "))

val u8 = Vectors.semanticCandidatePairs(emb, "vec_id", "embedding",
  Vectors.kmeans(emb, "vec_id", "embedding", 8, 0))
println(f"| k=8 untrained (oracled init) | $u8%d | ${u8.toDouble * 16 / (n * n)}%.2f |")

for (k <- Seq(8, 16, 32, 64)) {
  val t0 = System.nanoTime
  val cents = Vectors.kmeans(emb, "vec_id", "embedding", k, 3)
  val p = Vectors.semanticCandidatePairs(emb, "vec_id", "embedding", cents)
  val secs = (System.nanoTime - t0) / 1e9
  // ratio-to-floor: p / (n²/2k) — 1.0 = perfectly balanced clusters
  println(f"| k=$k%d trained (3 iters) | $p%d | ${p.toDouble * 2 * k / (n * n)}%.2f | train+assign $secs%.1f s |")
}
println(s"semanticK rule at this n: k = ${Vectors.semanticK(n, 1024)} (target 1024/cluster)")
System.exit(0)
