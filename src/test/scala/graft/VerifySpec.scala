package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Verify's local-iteration guards (pure helpers — no
  * SparkSession): a typo'd SPARK_GRAFT_VERIFY_ONLY name must warn
  * loudly instead of silently running nothing, and every filtered run
  * must flag that unselected query dirs in outDir may be stale. */
class VerifySpec extends AnyFunSuite {

  private val known = Set("q_a", "q_b", "q_c")

  test("unfiltered runs emit no diagnostics") {
    assert(Verify.filterDiagnostics(None, known, 3, "/tmp/out").isEmpty)
  }

  test("a filtered run always carries the stale-outDir notice") {
    val out = Verify.filterDiagnostics(Some(Set("q_a")), known, 1, "/tmp/out")
    assert(out.size == 1)
    assert(out.head.contains("filtered run (1/3 queries)"))
    assert(out.head.contains("/tmp/out") && out.head.contains("stale"))
  }

  test("unmatched names warn loudly, sorted, alongside the stale notice") {
    val out = Verify.filterDiagnostics(Some(Set("q_a", "q_typo2", "q_typo1")), known, 1, "/x")
    assert(out.size == 2)
    assert(out.head.contains("WARNING") &&
      out.head.contains("match no query: q_typo1, q_typo2"))
    assert(out.last.contains("stale"))
  }
}
