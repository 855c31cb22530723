// IVF∘PQ trained-vs-untrained coarse-quantizer probe: overlap@5 vs the
// exact float top-5 (q_sim_topk) for kmeans(k=8, iters=3) vs the
// deterministic iters=0 first-8 init, at nprobe 1/2/4 (candR=50, k=5,
// sf0.01). Evidence for SCALE.md's IVF∘PQ bullet: the coarse-cut loss
// is a boundary effect — nprobe is the dial, training a modest assist
// at dialed-up settings (measured: 0.495→0.476 / 0.619→0.619 /
// 0.771→0.800 at nprobe 1/2/4).
// Run: spark-shell --driver-class-path target/scala-2.13/classes \
//        -I scripts/ivfpq_trained_probe.scala
import org.apache.spark.sql.functions._
object IvfPqTrainedProbe {
  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val exact = graft.queries.GQuery.all.find(_.name == "q_sim_topk").get.fn(spark, dir)
      .filter(col("vec_id") <= 20).select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def recall(cents: org.apache.spark.sql.DataFrame, np: Int): Double = {
      val r = graft.ops.Vectors.ivfPqSearch(emb, "vec_id", "embedding", cents,
          16, 32, col("vec_id") <= 20, np, 50, 5)
        .select(col("vec_id"), col("nn_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      exact.keys.toSeq.map(k => (r.getOrElse(k, Set.empty[Long]) & exact(k)).size / 5.0).sum / exact.size
    }
    val untrained = graft.ops.Vectors.kmeans(emb, "vec_id", "embedding", 8, 0)
    val trained = graft.ops.Vectors.kmeans(emb, "vec_id", "embedding", 8, 3)
    for (np <- Seq(1, 2, 4))
      println(s"RECALL nprobe=$np untrained=${recall(untrained, np)} trained=${recall(trained, np)}")
  }
}
IvfPqTrainedProbe.run(spark)
System.exit(0)
