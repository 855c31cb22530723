package graft
import org.apache.spark.sql.SparkSession
object Bench {

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    .replace("\n", " ").replace("\r", " ").replace("\t", " ")
  private def f(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
  // stdout values are 2-decimal and trailing-zero-trimmed: the driver keeps
  // only the LAST 2000 CHARS of stdout and parses the JSON line out of that
  // window, so the line must stay short enough to survive the tail cut plus
  // sbt's trailing "[success] ..." line. Full 4-decimal timings + per-query
  // (min,max,n) spread + errors go to bench_detail.json instead.
  private def f2(d: Double) = {
    val s = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    if (t.isEmpty) "0" else t
  }

  /** The ONE driver-facing stdout line. LENGTH-INVARIANT in the query
    * count by construction — the full per-query map outgrew the
    * driver's 2000-char stdout tail twice (at ~80 queries and again at
    * 115), so `queries` carries only the 5 slowest and `errors` at most
    * 3 entries with messages cut to 60 chars. BenchSpec pins the bound
    * at 1000 queries / 1000 failures. Full data → [[detailJson]]. */
  def stdoutLine(results: Seq[(String, Either[String, Seq[Double]])], sfDir: String,
                 partialOf: Option[Int] = None): String = {
    val qs = results
      .collect { case (k, Right(ts)) => k -> ts.min }
      .sortBy(-_._2).take(5)
      .map { case (k, t) => s"\"" + k + "\":" + f2(t) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(ts)) => ts.min }.sum
    val nErr = results.count(_._2.isLeft)
    // numeric sf parsed from the dir name keeps the line short; falls back to
    // the raw path if the suffix isn't numeric
    // strict numeric shape: leading-zero integer parts ("007") are valid
    // digit strings but invalid bare JSON number tokens (RFC 8259), so
    // they take the quoted-string branch like any other non-number
    val sfNum = sfDir.split("/").lastOption.map(_.stripPrefix("sf")) match {
      case Some(s) if s.matches(raw"(0|[1-9]\d*)(\.\d+)?") => s
      case _ => "\"" + esc(sfDir) + "\""
    }
    // errors on stdout: at most 3, messages truncated to 60 chars, so a
    // mass failure can't blow the line either; the real count is n_errors
    // and the full messages are in bench_detail.json.
    val errsShort = results.collect { case (k, Left(e)) => s"\"${k}\":\"${esc(e.take(60))}\"" }
      .take(3).mkString("{", ",", "}")
    val errField = if (nErr == 0) "" else s""","errors":$errsShort"""
    // Partial marker (shutdown-hook path only): the driver killed the
    // JVM mid-sweep, so the line covers `results.size` of `n_total`
    // queries — flagged explicitly so a truncated sweep can never be
    // mistaken for a complete one.
    val partField = partialOf.map(n => s""","partial":true,"n_done":${results.size},"n_total":$n""").getOrElse("")
    s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs$errField,"n_errors":$nErr$partField,"sf":$sfNum}"""
  }

  /** Budget-aware run plan for the NEXT query: (runWarmup, timedRuns,
    * allowExtraOverSecs). Round 14's official bench artifact was rc 124
    * (driver kill) because 1 warm-up + 3 timed + up to 2 extra noop
    * executions x 228 queries outgrew the driver's window — this
    * scheduler degrades gracefully instead of dying with nothing:
    * full fidelity (warmup + nRuns + extras) while the projection fits
    * the budget, then warmup + 1 timed, then a single bare run. The
    * projection uses the observed per-EXECUTION average so far (not
    * per-query — mode switches change executions per query), which
    * self-corrects as the sweep progresses. Pure function: BenchSpec
    * pins the thresholds. */
  def planRuns(elapsedS: Double, execsDone: Long, queriesLeft: Int,
               nRuns: Int, budgetS: Double): (Boolean, Int, Boolean) = {
    val perExec = if (execsDone > 0) elapsedS / execsDone else 0.0
    val remaining = budgetS - elapsedS
    // +1 for the warm-up pass; extras (slow-query +2) are deliberately
    // left out of the projection — they only fire on the slow tail and
    // the per-exec average already reflects suite-wide cost
    if (queriesLeft * (nRuns + 1) * perExec <= remaining) (true, nRuns, true)
    else if (queriesLeft * 2.0 * perExec <= remaining) (true, 1, false)
    else (false, 1, false)
  }

  /** The full-fidelity record written to bench_detail.json: every query's
    * min-of-N headline, the (min,max,n) spread, and complete error text. */
  def detailJson(results: Seq[(String, Either[String, Seq[Double]])],
                 sfDir: String, nRuns: Int,
                 modes: Map[String, Int] = Map.empty): String = {
    val spread = results.collect { case (k, Right(ts)) =>
      s"""\"$k\":{"min":${f(ts.min)},"max":${f(ts.max)},"n":${ts.size}}"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => s"\"${k}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(ts)) => ts.min }.sum
    val nErr = results.count(_._2.isLeft)
    val modesField = if (modes.isEmpty) "" else
      modes.toSeq.sortBy(_._1).map { case (k, v) => s"\"$k\":$v" }
        .mkString(""","modes":{""", ",", "}")
    s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${
      results.map { case (k, v) => s"\"$k\":" + v.map(ts => f(ts.min)).getOrElse("-1.0") }
        .mkString("{", ",", "}")
    },"spread":$spread,"errors":$errors,"n_errors":$nErr$modesField,"timing":"warmup1_discarded_min_of_${nRuns}_plus_extra_over_1s_clearcache_per_iter_budget_degrade","sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Wall-clock budget for the WHOLE sweep (seconds), measured from
    // here (Spark session is up; sbt/JVM startup is outside our
    // control). Round 14's driver bench died at rc 124 with NOTHING on
    // stdout — the full-fidelity protocol outgrew the kill window at
    // 228 queries. Two independent defenses, both pinned in BenchSpec:
    // (1) planRuns degrades per-query fidelity once the projection
    // exceeds this budget, so the sweep finishes and covers EVERY
    // query; (2) a shutdown hook (below) emits a partial-but-parseable
    // stdout line + detail file if the JVM is killed anyway.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "900").toDouble
    val t0Sweep = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - t0Sweep) / 1e9
    // local-iteration filter (comma-separated query ids); the driver
    // never sets it, so the per-round bench always covers everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Suite-order probe: alphabetical by default; "reverse" flips it.
    // Exists to separate suite-position effects (page cache, heap
    // shape, JIT state inherited from earlier queries) from genuine
    // per-query regressions — run both orders, compare per-query mins.
    val reverseOrder = sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reverse")
    val ordered0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered = (if (reverseOrder) ordered0.reverse else ordered0)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Shared accumulator + shutdown hook, registered BEFORE the warm-up
    // loop (a kill during the multi-second warm-up/startup phase must
    // still produce a parseable line — the round-14 kill test caught
    // exactly that hole): if the driver SIGTERMs the JVM mid-sweep
    // (rc 124, round 14), the hook emits a stdout line flagged
    // "partial" and a detail file from whatever completed — a truncated
    // sweep beats an empty artifact. The hook only prints; it does NOT
    // spark.stop() (slow, and Spark registers its own stop hook).
    val acc = new scala.collection.mutable.ArrayBuffer[(String, Either[String, Seq[Double]])]()
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val detailPath = java.nio.file.Paths.get("bench_detail.json").toAbsolutePath
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!finished.get()) {
        val partial = acc.synchronized(acc.toSeq)
        try java.nio.file.Files.write(detailPath,
          (detailJson(partial, sfDir, 0) + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
        println(stdoutLine(partial, sfDir, partialOf = Some(ordered.size)))
        System.out.flush()
      }
    }))
    // Untimed warmup at the smallest SF: pays the one-time JIT/codegen/
    // planner costs so per-query timings measure the queries, not JVM
    // cold start (standard benchmarking practice).
    val warm = Seq("q_agg_hash", "q_win_analytic", "q_dedup_ngram", "q_join_broadcast")
    warm.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Each query timed N times (default 3), min reported as the
    // headline: a single local-JVM run is exposed to one-off GC/
    // compilation stalls that can inflate one query's number 20x
    // (observed: 1.2s query recorded as 32s); min-of-N measures the
    // query, not the stall. The full (min, max, n) spread is emitted
    // per query so a cross-round swing can be attributed to machine
    // noise (max >> min within a round) vs a plan regression (tight
    // spread at a new level) without re-running. A failed query is
    // reported explicitly in `errors` (never silently timed as if it
    // ran). Queries over cachedFixture tables (q_cdc_*, q_dedup_
    // incremental) pay their one-time fixture build in the DISCARDED
    // warm-up run (below), so even `max` now times the steady-state
    // read/serve path the fixture exists to isolate.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    // Slow queries get extra iterations: within-run spread (GC, JIT
    // recompiles, page-cache state) reached 3.2x max/min on multi-second
    // queries at n=3, wide enough to hide a real 2x regression. Once a
    // query's min exceeds 1 s, two more runs tighten the min estimate at
    // negligible suite cost (only the already-slow tail pays them).
    val extraRunsOverSecs = 1.0
    val nExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA", "2").toInt.max(0)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      // noop sink, NOT .count(): count() lets Catalyst prune any
      // aggregate expression the final projection doesn't force and
      // eliminate top-level sorts, under-timing exactly that work (a
      // bare multi-distinct agg measures 0.2 s under count() vs 6.3 s
      // executed — the scale-probe lesson, round 14). The noop write
      // runs the full physical plan and discards rows.
      val r = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      }
      catch { case e: Throwable =>
        Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200))
      }
      // Iteration isolation (untimed): a few queries cache() a shared
      // subtree for in-query fan-out reuse (q_agg_hll_merge, q_text_
      // search, q_lm_score, q_curate) and a lazy DataFrame can't
      // unpersist before return. Without this, those caches leak into
      // every LATER query's heap/GC budget — the round-11 bench showed
      // an 11-query contiguous block regressing 2-11.5x starting at the
      // exact suite position after the first caching query. Clearing
      // per ITERATION (not just per query) also makes each timed run
      // pay the query's full cost, so min-of-N measures the query, not
      // a warm intra-query cache.
      spark.catalog.clearCache()
      r
    }
    var execs = 0L
    val modeCounts = scala.collection.mutable.Map("full" -> 0, "degraded" -> 0, "minimal" -> 0)
    ordered.zipWithIndex.foreach { case ((name, fn), i) =>
      val (doWarmup, timedRuns, allowExtra) =
        planRuns(elapsedS, execs, ordered.size - i, nRuns, budgetS)
      modeCounts(if (allowExtra) "full" else if (doWarmup) "degraded" else "minimal") += 1
      // One DISCARDED warm-up run per query: absorbs the one-time
      // first-iteration costs (fixture build for cachedFixture
      // queries, parquet page-cache population, per-query codegen)
      // that were the dominant max/min spread source at n=3 —
      // 11 of 19 >=1 s queries exceeded 1.5x max/min with the
      // warm-up folded into the timed runs. Skipped in minimal mode
      // (budget nearly gone): the single timed run then carries the
      // first-run costs, which the "minimal" mode count discloses.
      if (doWarmup) { once(fn); execs += 1 }
      val base = Iterator.continually { execs += 1; once(fn) }.take(timedRuns).toSeq
      val oks = base.collect { case Right(t) => t }
      val extra = if (allowExtra && oks.nonEmpty && oks.min >= extraRunsOverSecs)
        Iterator.continually { execs += 1; once(fn) }.take(nExtra).toSeq else Seq.empty
      val runs = base ++ extra
      // one success is enough to report a time; all-failed reports the
      // first error
      val r = runs.collect { case Right(t) => t } match {
        case ts if ts.nonEmpty => Right(ts)
        case _ => Left(runs.collectFirst { case Left(e) => e }.get)
      }
      acc.synchronized(acc += (name -> r))
    }
    val results: Seq[(String, Either[String, Seq[Double]])] = acc.toSeq
    java.nio.file.Files.write(detailPath,
      (detailJson(results, sfDir, nRuns, modeCounts.toMap) + "\n").getBytes("UTF-8"))
    // complete line FIRST, finished-flag second: a kill landing between
    // the two re-prints a partial line after the complete one (harmless
    // — same coverage), whereas the opposite order could die with
    // nothing on stdout
    println(stdoutLine(results, sfDir))
    System.out.flush()
    finished.set(true)
    spark.stop()
  }
}
