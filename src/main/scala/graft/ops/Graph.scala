package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ranking over pair lists (the dedup-graph shape: undirected
  * near-dup edges between documents).
  *
  * PageRank is INTEGER-EXACT: ranks live on a 1e9 fixed-point grid,
  * the damping step is floor(rank·17 / (20·deg)) (0.85 = 17/20) and
  * the teleport is floor(0.15e9 / N) — every iteration is integer
  * arithmetic, so any round count produces bit-identical fixpoints on
  * any engine and any partitioning (a float formulation would tie the
  * result to summation order). Each round is ONE edge-key join + one
  * dst aggregation over the localCheckpoint'd symmetric edge list;
  * rank state is node-sized, lineage is truncated per round. The
  * graph-node count is a bounded driver scalar.
  *
  * `rounds` is the accuracy dial: per round the un-teleported mass
  * contracts by the 0.85 damping factor, so the per-node residual
  * shrinks geometrically (GraphSpec asserts the monotone decrease;
  * SCALE.md carries measured residuals on the corpus graph — the
  * default 5 matches the oracled q_graph_pagerank).
  */
object Graph {

  /** Damped PageRank over an undirected pair list (first two columns =
    * endpoints). Returns (doc_id, rank) on the 1e9 grid, one row per
    * node with degree ≥ 1. */
  def pagerank(pairs: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 0, "pagerank: rounds must be >= 0")
    val Seq(ea, eb) = pairs.columns.toSeq.take(2)
    val p = pairs.select(col(ea).as("id_a"), col(eb).as("id_b")).localCheckpoint()
    // r21: a src-hash repartition before this checkpoint was tried and
    // reverted (no change at sf0.1, +0.2 s on q_text_keywords): the
    // per-round edges ⋈ contrib join broadcasts the node-sized contrib
    // side, so the edge list is streamed in place, never re-shuffled —
    // the extra exchange bought nothing. At cluster scale with a
    // node set too big to broadcast, partition-once-join-many is the
    // right shape; revisit if the broadcast threshold is ever crossed.
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count() // bounded driver scalar: graph-node count
    val (init, tele) = if (n == 0) (0L, 0L) else (1000000000L / n, 150000000L / n)
    var ranks = deg.select(col("src").as("doc_id"), lit(init).as("rank"))
    for (_ <- 1 to rounds) {
      val contrib = ranks.join(deg, ranks("doc_id") === deg("src"))
        .select(col("doc_id").as("j"), expr("(rank * 17) div (20 * deg)").as("c"))
      val inflow = edges.join(contrib, col("src") === col("j"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_c"))
      ranks = deg.select(col("src").as("doc_id"))
        .join(inflow, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"),
          (lit(tele) + coalesce(col("in_c"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** L1 residual between consecutive round counts, Σ|rank_r − rank_{r−1}|
    * on the 1e9 grid — the convergence evidence for picking `rounds`. */
  def pagerankResidual(pairs: DataFrame, round: Int): Long = {
    val a = pagerank(pairs, round - 1).withColumnRenamed("rank", "ra")
    val b = pagerank(pairs, round).withColumnRenamed("rank", "rb")
    val r = a.join(b, "doc_id")
      .agg(sum(abs(col("rb") - col("ra")))).head()
    // sum() over an empty graph is NULL — residual of nothing is 0
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
