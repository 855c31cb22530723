package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's driver-facing contract: the stdout line must stay
  * parseable out of a 2000-char stdout tail AT ANY QUERY COUNT. The
  * full map outgrew that window twice (~80 queries in round 6, 115 in
  * round 9) — this spec makes the bound structural, not resized-to-fit.
  * No SparkSession needed: both emitters are pure functions of the
  * timing results.
  */
class BenchSpec extends AnyFunSuite {

  private def results(nOk: Int, nErr: Int): Seq[(String, Either[String, Seq[Double]])] = {
    val ok = (1 to nOk).map(i =>
      s"q_generated_query_name_$i" -> Right(Seq(i * 0.013, i * 0.017, i * 0.011)))
    val err = (1 to nErr).map(i =>
      s"q_failing_query_$i" -> Left("SparkException: " + ("boom " * 40)))
    ok ++ err
  }

  // conservative: well under the 2000-char tail even after sbt appends
  // its own trailing lines
  private val Bound = 800

  test("stdout line stays under the bound at 1000 queries, 0 errors") {
    val line = Bench.stdoutLine(results(1000, 0), "/root/testdata/sf0.1")
    assert(line.length < Bound, s"${line.length} chars: $line")
  }

  test("stdout line stays under the bound when every one of 1000 queries fails") {
    val line = Bench.stdoutLine(results(0, 1000), "/root/testdata/sf0.1")
    assert(line.length < Bound, s"${line.length} chars: $line")
    assert(line.contains("\"n_errors\":1000"))
  }

  test("stdout line carries the 5 slowest queries and a numeric sf") {
    val line = Bench.stdoutLine(results(100, 0), "/root/testdata/sf0.1")
    // slowest = highest index (time grows with i)
    assert(line.contains("q_generated_query_name_100"))
    assert(line.contains("q_generated_query_name_96"))
    assert(!line.contains("q_generated_query_name_95\""))
    assert(line.contains("\"sf\":0.1"))
    assert(line.contains("\"n_errors\":0"))
  }

  test("totals agree between the stdout line and the detail record") {
    val rs = results(10, 2)
    val total = rs.collect { case (_, Right(ts)) => ts.min }.sum
    val line = Bench.stdoutLine(rs, "/root/testdata/sf0.01")
    val detail = Bench.detailJson(rs, "/root/testdata/sf0.01", 3)
    val lineVal = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val detVal = """"value":([0-9.]+)""".r.findFirstMatchIn(detail).get.group(1).toDouble
    assert(math.abs(lineVal - total) <= 0.0051) // 2-decimal rounding (± half-ULP at the boundary)
    assert(math.abs(detVal - total) < 0.00005) // 4-decimal rounding
    assert(detail.contains("\"n_errors\":2"))
    // detail keeps EVERY query; the stdout line must not
    assert((1 to 10).forall(i => detail.contains(s"q_generated_query_name_$i")))
  }

  test("partial line carries the marker, the coverage counts, and stays bounded") {
    val line = Bench.stdoutLine(results(120, 1), "/root/testdata/sf0.1", partialOf = Some(228))
    assert(line.contains("\"partial\":true"))
    assert(line.contains("\"n_done\":121"))
    assert(line.contains("\"n_total\":228"))
    assert(line.length < Bound, s"${line.length} chars: $line")
    // a complete line must NOT carry the marker
    assert(!Bench.stdoutLine(results(120, 1), "/root/testdata/sf0.1").contains("partial"))
  }

  // The round-14 lesson (rc 124, nothing parseable) and the round-15
  // lesson (parseable but 205/229 queries at n=1, alphabetic fidelity
  // stripes): the sweep must fit the driver's kill window at ANY query
  // count, and under pressure must drop the EXPENSIVE TAIL of a round,
  // not a stripe of the alphabet. fitRound is that one decision point.
  test("fitRound selects the cost-ascending greedy prefix that fits the budget") {
    val costs = Seq("q_big" -> 10.0, "q_small" -> 1.0, "q_mid" -> 3.0)
    // 5s budget: q_small (1) + q_mid (4 cumulative) fit; q_big does not
    assert(Bench.fitRound(costs, 5.0) == Seq("q_small", "q_mid"))
    // everything fits
    assert(Bench.fitRound(costs, 100.0) == Seq("q_small", "q_mid", "q_big"))
    // nothing fits / no budget left: empty, never negative-selects
    assert(Bench.fitRound(costs, 0.5).isEmpty)
    assert(Bench.fitRound(costs, -3.0).isEmpty)
    assert(Bench.fitRound(Nil, 100.0).isEmpty)
  }

  test("warmTier picks the largest uniform tier that fits, degrading together") {
    // 100s of estimated cold cost; nRuns=3
    assert(Bench.warmTier(100.0, 3, 1000.0) == 3) // 300 <= 900
    assert(Bench.warmTier(100.0, 3, 250.0) == 2)  // 300 > 225, 200 <= 225
    assert(Bench.warmTier(100.0, 3, 120.0) == 1)
    assert(Bench.warmTier(100.0, 3, 50.0) == 0)   // even one pass won't fit
    assert(Bench.warmTier(100.0, 3, -10.0) == 0)  // budget already blown
    assert(Bench.warmTier(0.0, 3, 0.0) == 3)      // empty suite: vacuous full tier
  }

  test("fitRound breaks cost ties by name for a deterministic schedule") {
    val costs = Seq("q_b" -> 1.0, "q_a" -> 1.0, "q_c" -> 1.0)
    assert(Bench.fitRound(costs, 2.0) == Seq("q_a", "q_b"))
  }

  test("deflateColdEsts scales never-warmed cold costs by the observed warm/cold ratio") {
    // the BENCH_r18 shape: the cold sweep on a contended box measured
    // ~20x the warm cost — warmed queries show ratio 0.05-0.1, and
    // never-warmed queries' projections must shrink accordingly
    val cold = Map("a" -> 20.0, "b" -> 10.0, "c" -> 40.0)
    val cur = Map("a" -> 2.0, "b" -> 1.0, "c" -> 40.0) // a,b warmed; c not
    val out = Bench.deflateColdEsts(cold, cur, Set("a", "b"))
    assert(out("a") == 2.0 && out("b") == 1.0) // warmed estimates pass through
    assert(out("c") == 40.0 * 0.1) // median of (0.1, 0.1) = 0.1
  }

  test("deflateColdEsts clamps the ratio and passes through without warm evidence") {
    // no warmed queries → nothing to calibrate on: unchanged
    val cold = Map("a" -> 5.0)
    assert(Bench.deflateColdEsts(cold, cold, Set.empty) == cold)
    // a pathological tiny ratio clamps at 0.05 (a projection must
    // never collapse to ~zero and blow the budget guard)...
    val tiny = Bench.deflateColdEsts(
      Map("a" -> 1000.0, "c" -> 100.0), Map("a" -> 1.0, "c" -> 100.0), Set("a"))
    assert(tiny("c") == 100.0 * 0.05)
    // ...and a warm run SLOWER than cold clamps at 1 (deflation only —
    // the cold number is already real evidence of this box's cost)
    val slow = Bench.deflateColdEsts(
      Map("a" -> 1.0, "c" -> 10.0), Map("a" -> 3.0, "c" -> 10.0), Set("a"))
    assert(slow("c") == 10.0)
    // a warmed query missing its cold time (cold run errored, warm
    // succeeded) contributes no ratio but keeps its own estimate
    val gap = Bench.deflateColdEsts(
      Map("c" -> 10.0), Map("a" -> 2.0, "c" -> 10.0), Set("a"))
    assert(gap == Map("a" -> 2.0, "c" -> 10.0))
  }

  test("detail record carries the mode counts when provided") {
    val d = Bench.detailJson(results(3, 0), "/x", 3, Map("full" -> 2, "degraded" -> 1))
    assert(d.contains("\"modes\":{\"degraded\":1,\"full\":2}"))
  }

  test("detail record tags each query's spread entry with its fidelity mode") {
    val rs = results(2, 0)
    val d = Bench.detailJson(rs, "/x", 3, Map("full" -> 1, "minimal" -> 1),
      Map("q_generated_query_name_1" -> "full", "q_generated_query_name_2" -> "minimal"))
    assert(d.contains(""""q_generated_query_name_1":{"min":0.0110,"max":0.0170,"n":3,"mode":"full"}"""), d)
    assert(d.contains(""""mode":"minimal""""), d)
    // without modes the spread entry stays in the pre-16 shape
    assert(Bench.detailJson(rs, "/x", 3).contains(""""n":3}"""))
  }

  test("a 20x-contended box stamps degraded=true with its contention factor (r20 self-labeling)") {
    // the BENCH_r18/r19 failure shape: the official artifact was an
    // n=1 cold sweep on a ~20x loaded box that read as a 5x regression.
    // With the committed reference, the SAME evidence now labels
    // itself: observed colds ~20x the reference warm mins, quiet-box
    // cold factor 2.0 → contention_factor ~10, degraded
    val ref = (1 to 30).map(i => s"q_$i" -> i * 0.5).toMap
    val contended = ref.map { case (n, t) => n -> t * 40.0 } // cold = 40x warm ref
    val cf = Bench.contentionFactor(ref, contended, refColdFactor = 2.0)
    assert(cf.exists(f => math.abs(f - 20.0) < 0.001), cf.toString)
    assert(cf.exists(_ > Bench.DegradedAt))
    val label = cf.map(f => (f, f > Bench.DegradedAt))
    val line = Bench.stdoutLine(results(5, 0), "/root/testdata/sf0.1", label = label)
    assert(line.contains("\"degraded\":true") && line.contains("\"contention_factor\":20"), line)
    assert(line.length < Bound)
    val detail = Bench.detailJson(results(5, 0), "/x", 3,
      coldTimes = Map("q_1" -> 1.25), label = label)
    assert(detail.contains("\"degraded\":true"), detail)
    assert(detail.contains("\"cold\":{\"q_1\":1.2500}"), detail)
  }

  test("a quiet box labels degraded=false; thin overlap ships unlabeled, never mislabeled") {
    val ref = (1 to 30).map(i => s"q_$i" -> i * 0.5).toMap
    // quiet: colds at ~2x the warm reference (fixture builds + codegen),
    // exactly the committed cold factor → contention_factor ~1
    val quiet = ref.map { case (n, t) => n -> t * 2.0 }
    val cf = Bench.contentionFactor(ref, quiet, refColdFactor = 2.0)
    assert(cf.exists(f => math.abs(f - 1.0) < 0.001), cf.toString)
    assert(cf.forall(_ <= Bench.DegradedAt))
    val line = Bench.stdoutLine(results(3, 0), "/x",
      label = cf.map(f => (f, f > Bench.DegradedAt)))
    assert(line.contains("\"degraded\":false"), line)
    // new queries absent from the reference contribute nothing;
    // below-minCommon overlap (a filtered _ONLY run) yields None —
    // the artifact then simply omits the label fields
    assert(Bench.contentionFactor(ref, Map("q_new" -> 5.0), 2.0).isEmpty)
    assert(Bench.contentionFactor(
      ref.take(5), ref.take(5).map { case (n, t) => n -> t * 2 }, 2.0).isEmpty)
    assert(!Bench.stdoutLine(results(3, 0), "/x").contains("degraded"))
    assert(!Bench.detailJson(results(3, 0), "/x", 3).contains("degraded"))
    // the median shrugs off one legitimately-grown query
    val oneGrown = quiet + ("q_1" -> 500.0)
    val cf2 = Bench.contentionFactor(ref, oneGrown, 2.0)
    assert(cf2.exists(_ < Bench.DegradedAt), cf2.toString)
  }

  test("the committed reference resource parses when present") {
    // after scripts/gen_bench_reference.py has blessed a quiet sweep,
    // the resource must round-trip through loadReference; before that
    // (a fresh tree) Bench runs unlabeled
    Bench.loadReference().foreach { case (ref, coldFactor, sf) =>
      assert(ref.size >= 20, s"reference too thin: ${ref.size}")
      assert(ref.values.forall(_ > 0))
      assert(coldFactor > 0 && coldFactor < 100, coldFactor.toString)
      assert(!ref.contains("cold_factor"))
      // the sf gate: a reference without its scale factor would label
      // runs at ANY sf against these mins — refuse at the source
      assert(sf.nonEmpty && sf.startsWith("sf"), s"reference sf: '$sf'")
    }
  }

  test("fidelity label: full only when every query reached mode=full, else the histogram") {
    assert(Bench.fidelityOf(Map("a" -> "full", "b" -> "full")) == "full")
    assert(Bench.fidelityOf(Map("a" -> "full", "b" -> "degraded", "c" -> "minimal"))
      == "partial(full=1,degraded=1,minimal=1)")
    // empty = nothing measured: never "full"
    assert(Bench.fidelityOf(Map.empty).startsWith("partial"))
    // threaded to BOTH artifacts — the r20 artifact was 199/244 at n=1
    // with nothing at the top level saying so
    val line = Bench.stdoutLine(results(3, 0), "/x",
      fidelity = Some("partial(full=1,degraded=2,minimal=0)"))
    assert(line.contains(""""fidelity":"partial(full=1,degraded=2,minimal=0)""""))
    assert(line.length < Bound)
    val det = Bench.detailJson(results(3, 0), "/x", 3,
      queryModes = Map("q_generated_query_name_1" -> "full",
        "q_generated_query_name_2" -> "degraded", "q_generated_query_name_3" -> "full"))
    assert(det.contains(""""fidelity":"partial(full=2,degraded=1,minimal=0)""""))
  }

  test("stall cap: capFactor x best cold evidence with a floor; uncapped without evidence") {
    assert(Bench.capSeconds(None, None, 5.0, 15.0).isEmpty)
    assert(Bench.capSeconds(Some(6.0), None, 5.0, 15.0).contains(30.0))
    // the floor: sub-second queries can't be capped by timer jitter
    assert(Bench.capSeconds(Some(1.0), Some(2.0), 5.0, 15.0).contains(15.0))
    // max of reference and own evidence: a fixture that legitimately
    // grew since the reference isn't capped against stale numbers
    assert(Bench.capSeconds(Some(2.0), Some(8.0), 5.0, 15.0).contains(40.0))
  }

  test("capped samples are disclosed per query in the detail spread") {
    val det = Bench.detailJson(results(2, 0), "/x", 3,
      capped = Map("q_generated_query_name_1" -> 1))
    assert(det.contains(""""capped":1"""))
    // and absent when zero — no noise on clean queries
    assert(!det.contains(""""capped":0"""))
  }

  test("error messages are escaped and truncated on the stdout line") {
    val rs = Seq("q_bad" -> Left("""Exception: "quoted"
	tabbed and very very very very very very very very long message"""))
    val line = Bench.stdoutLine(rs, "/tmp/x")
    assert(line.contains("\\\"quoted\\\""))
    assert(!line.contains("\n") && !line.contains("\t"))
    assert(line.length < Bound)
  }
}
