package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the parameterized integer PageRank operator: the rounds dial
  * actually moves the result toward a fixpoint (monotone-decreasing L1
  * residual), rank mass stays on the 1e9 grid up to floor loss, and
  * the well-known ranking property holds (higher-degree nodes of a
  * star out-rank leaves). q_graph_pagerank's values are gated by its
  * DuckDB oracle; this spec owns the operator's own contract. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a 1-4 star glued to a 4-5-6 chain: known shape, mixed degrees
  private def pairs = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L))
    .toDF("id_a", "id_b")

  test("pagerank: star center out-ranks leaves; mass conserved up to floor loss") {
    val r = Graph.pagerank(pairs, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(r.size == 6)
    // degree-3 hub beats every degree-1 leaf
    assert(r(1L) > r(2L) && r(1L) > r(3L) && r(1L) > r(6L))
    // total mass: 1e9 minus bounded floor truncation (each of the 6
    // nodes loses < 1 unit per div, 5 rounds, plus the init division)
    val total = r.values.sum
    assert(total <= 1000000000L && total > 990000000L, s"mass drifted: $total")
  }

  test("pagerank: rounds is a real dial with geometrically shrinking residual") {
    // rounds=0 is the uniform init; each added round must move ranks
    // strictly less than the previous one (0.85 contraction)
    val res = (1 to 5).map(r => Graph.pagerankResidual(pairs, r))
    assert(res.head > 0, "round 1 changed nothing — dial is dead")
    res.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"residual grew between rounds: $res")
    }
    // geometric decay: by round 5 the step is well under a tenth of
    // the first step (0.85^4 ≈ 0.52 is the worst case; real graphs
    // with teleport mass converge much faster)
    assert(res.last < res.head, s"no convergence progress: $res")
  }

  test("pagerank: empty graph and rounds=0 degenerate cleanly") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.pagerank(empty, 3).count() == 0)
    val r0 = Graph.pagerank(pairs, 0).select(col("rank")).distinct()
      .as[Long].collect().toSeq
    assert(r0 == Seq(1000000000L / 6), "rounds=0 must be the uniform init")
  }
}
