// Companion to scale_probe.scala: at the 10x corpus, is the dedup
// slowdown data or configuration? Times the two shuffle-heavy dedup
// queries at shuffle.partitions = 32 vs 128 on the 10x corpus.
// Run AFTER scale_probe.scala has built /tmp/graft_scale10.
import graft.queries.GQuery

val scaled = "/tmp/graft_scale10"
val queries = Seq("q_dedup_minhash", "q_dedup_ngram")

def time(name: String): Double = {
  val fn = GQuery.all.find(_.name == name).get.fn
  (1 to 3).map { _ =>
    val t0 = System.nanoTime(); fn(spark, scaled).count(); (System.nanoTime() - t0) / 1e9
  }.min
}

for (p <- Seq("32", "128")) {
  spark.conf.set("spark.sql.shuffle.partitions", p)
  for (q <- queries) println(f"$q%-16s partitions=$p%-4s ${time(q)}%7.2f s")
}
System.exit(0)
