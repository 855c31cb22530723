package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * clustering core behind q_dedup_cluster (near-dup pair graph →
  * duplicate clusters), usable over any undirected edge list.
  *
  * Each round is one join of the edge set against the current labels
  * plus one min-aggregation — pure shuffle-parallel work, no driver
  * data. Rounds = component diameter; near-dup graphs are
  * small-diameter, and the documented upgrade for deep components at
  * 100 TB is the large-star/small-star round-halving variant
  * ("Connected Components in MapReduce and Beyond", Kiveris et al.
  * 2014). Per-round localCheckpoint truncates the lineage (iterative
  * plans otherwise grow exponentially in the optimizer); convergence
  * is detected with a 1-row sum aggregate (labels only ever decrease,
  * so an unchanged sum == fixpoint — no per-row diff join).
  */
object Components {

  /** Label every node with the smallest node id reachable from it.
    *
    * @param nodes single-column DF of node ids (long)
    * @param pairs two-column DF of undirected edges (long, long)
    * @return (id, lab) DF — lab = min id of the node's component
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxRounds: Int = 50): DataFrame = {
    val Seq(na) = nodes.columns.toSeq.take(1)
    val Seq(ea, eb) = pairs.columns.toSeq.take(2)
    // undirected: propagate min labels both ways along each edge
    val edges = pairs.select(col(ea), col(eb))
      .union(pairs.select(col(eb), col(ea)))
      .toDF("src", "dst").localCheckpoint()
    var labels = nodes.select(col(na).as("id"), col(na).as("lab")).localCheckpoint()
    var prevSum = labels.agg(sum(col("lab"))).head.getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab"))
      labels = labels.union(prop)
        .groupBy(col("id")).agg(min(col("lab")).as("lab"))
        .localCheckpoint()
      val cur = labels.agg(sum(col("lab"))).head.getLong(0)
      converged = cur == prevSum
      prevSum = cur
      rounds += 1
    }
    // a silent non-converged return would hand back WRONG labels (a
    // >maxRounds-diameter chain still mid-propagation) — fail loudly;
    // the caller raises maxRounds or switches to the round-halving
    // large-star/small-star variant
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds — " +
        "component diameter exceeds the bound; raise maxRounds or use " +
        "large-star/small-star (Kiveris et al. 2014)")
    labels
  }
}
