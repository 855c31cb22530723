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
  def stdoutLine(results: Seq[(String, Either[String, Seq[Double]])], sfDir: String): String = {
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
    s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs$errField,"n_errors":$nErr,"sf":$sfNum}"""
  }

  /** The full-fidelity record written to bench_detail.json: every query's
    * min-of-N headline, the (min,max,n) spread, and complete error text. */
  def detailJson(results: Seq[(String, Either[String, Seq[Double]])],
                 sfDir: String, nRuns: Int): String = {
    val spread = results.collect { case (k, Right(ts)) =>
      s"""\"$k\":{"min":${f(ts.min)},"max":${f(ts.max)},"n":${ts.size}}"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => s"\"${k}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(ts)) => ts.min }.sum
    val nErr = results.count(_._2.isLeft)
    s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${
      results.map { case (k, v) => s"\"$k\":" + v.map(ts => f(ts.min)).getOrElse("-1.0") }
        .mkString("{", ",", "}")
    },"spread":$spread,"errors":$errors,"n_errors":$nErr,"timing":"warmup1_discarded_min_of_${nRuns}_plus_extra_over_1s_clearcache_per_iter","sf":"$sfDir"}"""
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
    // local-iteration filter (comma-separated query ids); the driver
    // never sets it, so the per-round bench always covers everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Suite-order probe: alphabetical by default; "reverse" flips it.
    // Exists to separate suite-position effects (page cache, heap
    // shape, JIT state inherited from earlier queries) from genuine
    // per-query regressions — run both orders, compare per-query mins.
    val reverseOrder = sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reverse")
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
    val results: Seq[(String, Either[String, Seq[Double]])] = {
      val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      (if (reverseOrder) ordered.reverse else ordered)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        // One DISCARDED warm-up run per query: absorbs the one-time
        // first-iteration costs (fixture build for cachedFixture
        // queries, parquet page-cache population, per-query codegen)
        // that were the dominant max/min spread source at n=3 —
        // 11 of 19 >=1 s queries exceeded 1.5x max/min with the
        // warm-up folded into the timed runs.
        once(fn)
        val base = Iterator.continually(once(fn)).take(nRuns).toSeq
        val oks = base.collect { case Right(t) => t }
        val extra = if (oks.nonEmpty && oks.min >= extraRunsOverSecs)
          Iterator.continually(once(fn)).take(nExtra).toSeq else Seq.empty
        val runs = base ++ extra
        // one success is enough to report a time; all-failed reports the
        // first error
        val r = runs.collect { case Right(t) => t } match {
          case ts if ts.nonEmpty => Right(ts)
          case _ => Left(runs.collectFirst { case Left(e) => e }.get)
        }
        name -> r
      }
    }
    val detailPath = java.nio.file.Paths.get("bench_detail.json").toAbsolutePath
    java.nio.file.Files.write(detailPath,
      (detailJson(results, sfDir, nRuns) + "\n").getBytes("UTF-8"))
    println(stdoutLine(results, sfDir))
    spark.stop()
  }
}
