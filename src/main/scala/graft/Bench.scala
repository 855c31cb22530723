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
                 partialOf: Option[Int] = None,
                 label: Option[(Double, Boolean)] = None,
                 fidelity: Option[String] = None): String = {
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
    // Self-labeling (round 20): `degraded` says whether THIS box ran
    // within DegradedAt x of the committed quiet-box reference —
    // degraded:true means the totals are box noise, not a code
    // regression; readers should compare the committed full-fidelity
    // bench_detail.json instead. Absent = no reference overlap (never
    // mislabeled, just unlabeled).
    val labelField = label.map { case (cf, deg) =>
      s""","contention_factor":${f2(cf)},"degraded":$deg""" }.getOrElse("")
    // fidelity (round 21): `degraded` measures CONTENTION only; this
    // field says how much of the artifact is min-of-warm evidence —
    // "full", or the inline mode histogram when any query fell short
    // (the r20 artifact was 199/244 at n=1 and nothing at the top
    // level said so)
    val fidField = fidelity.map(fv => s""","fidelity":"$fv"""").getOrElse("")
    s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs$errField,"n_errors":$nErr$partField$labelField$fidField,"sf":$sfNum}"""
  }

  /** Round-level budget fit: the cost-ASCENDING greedy prefix of
    * `costs` whose cumulative projection stays inside `remaining`
    * seconds. This is the round-16 scheduler's one decision point —
    * round 15's per-query online degrade gave the middle of the
    * alphabet the worst fidelity while the tail ran full; scheduling a
    * whole round at a time with per-query cost estimates (a) gives
    * EVERY query its warm run before ANY query gets a third, and (b)
    * under pressure drops the expensive tail, not an alphabetic
    * stripe. Pure function: BenchSpec pins the greedy-prefix contract. */
  def fitRound(costs: Seq[(String, Double)], remaining: Double): Seq[String] = {
    val asc = costs.sortBy(c => (c._2, c._1))
    asc.scanLeft(("", 0.0)) { case ((_, acc), (n, c)) => (n, acc + c) }
      .drop(1).takeWhile(_._2 <= remaining).map(_._1)
  }

  /** The UNIFORM warm tier: the largest per-query run count t in
    * [0, nRuns] whose projection t·estSum fits the remaining budget
    * with 10% drift headroom. Uniform-first is the round-15 verdict's
    * "degrade to warmup+1 globally BEFORE any query drops to bare-1":
    * every query's fidelity moves together, and only leftover budget
    * differentiates (top-up rounds + slow-tail extras). Pure function,
    * BenchSpec-pinned. */
  def warmTier(estSum: Double, nRuns: Int, remaining: Double): Int =
    (nRuns to 0 by -1).find(t => t * estSum <= remaining * 0.9).getOrElse(0)

  /** Contended-box estimate correction (round 19 — BENCH_r18's cold
    * sweep ran on a loaded machine and measured 20-60x the warm cost;
    * scheduling the warm passes against those numbers collapsed the
    * whole round to n=1 fidelity): queries that HAVE a warm
    * observation keep it; queries that only have their cold-sweep cost
    * get it scaled by the MEDIAN observed warm/cold ratio of the
    * already-warmed queries — self-calibrating (the ratio comes from
    * this box, this run) and clamped to [0.05, 1] so a pathological
    * ratio can neither zero a projection nor inflate one above the
    * cold evidence. No warmed queries yet → estimates pass through
    * unchanged. Pure function, BenchSpec-pinned. */
  def deflateColdEsts(cold: Map[String, Double], current: Map[String, Double],
                      hasWarm: Set[String]): Map[String, Double] = {
    val ratios = hasWarm.toSeq.flatMap { n =>
      for (c <- cold.get(n); w <- current.get(n); if c > 0) yield w / c
    }.sorted
    if (ratios.isEmpty) current
    else {
      val ratio = math.min(1.0, math.max(0.05, ratios(ratios.size / 2)))
      current.map { case (n, e) =>
        n -> (if (hasWarm.contains(n)) e else cold.get(n).fold(e)(_ * ratio))
      }
    }
  }

  /** Committed quiet-box reference (task: self-labeling artifacts —
    * two rounds of official BENCH artifacts were n=1 cold sweeps on a
    * 20-180x contended box that a reader could mistake for a 5x
    * regression): `bench_reference.json` on the classpath carries the
    * per-query full-fidelity warm mins of a quiet-box sweep plus that
    * sweep's observed cold/warm median (`cold_factor` — cold runs pay
    * fixture builds and first-use codegen, so cold/warm > 1 even on an
    * idle machine; the label must compare LIKE statistics) and the
    * SCALE-FACTOR DIRECTORY it was measured at (timings are sf-specific
    * — labeling an sf0.01 run against sf0.1 mins would stamp nonsense).
    * Returns (per-query warm mins, quiet-box cold factor, sf dir
    * basename); None when the resource is absent (a fresh tree before
    * the first reference generation — the artifact then ships
    * unlabeled, never mislabeled). */
  def loadReference(): Option[(Map[String, Double], Double, String)] =
    Option(getClass.getResourceAsStream("/bench_reference.json")).map { in =>
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      // tiny flat parser (the file is machine-written by this repo's
      // scripts/gen_bench_reference.py — one "queries" object of
      // name:number pairs + a "cold_factor" number + an "sf" string)
      val qs = raw""""([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      val coldFactor = qs.getOrElse("cold_factor", 1.0)
      val sf = raw""""sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text)
        .map(_.group(1)).getOrElse("")
      (qs - "cold_factor" - "generated_from_total_s", coldFactor, sf)
    }

  /** Contention factor of THIS run vs the committed quiet-box
    * reference: median over the common queries of (observed cold /
    * reference warm min), normalized by the reference's own quiet-box
    * cold factor — ~1.0 on an idle box, ~k on a box running k× slow.
    * None when fewer than `minCommon` queries overlap (a filtered
    * SPARK_GRAFT_BENCH_ONLY run, or a reference too old to label this
    * tree). Median, not mean: one query whose fixture grew legitimately
    * must not relabel the whole run. Pure function, BenchSpec-pinned. */
  def contentionFactor(reference: Map[String, Double], coldObs: Map[String, Double],
                       refColdFactor: Double, minCommon: Int = 20): Option[Double] = {
    val ratios = coldObs.toSeq.flatMap { case (n, c) =>
      reference.get(n).filter(_ > 0).map(c / _)
    }.sorted
    if (ratios.size < minCommon || refColdFactor <= 0) None
    else Some(ratios(ratios.size / 2) / refColdFactor)
  }

  /** The degraded label: a run whose box was contended past this is
    * NOT cross-round comparable (the project gate is 2x at equal
    * methodology; 3.0 leaves headroom for honest box flicker so a
    * borderline-quiet run is never stamped degraded). */
  val DegradedAt = 3.0

  /** Compact FIDELITY label for the stdout line (round 21 — the r20
    * artifact was 199/244 at n=1 with `degraded:false`: the contention
    * label was CORRECT for what it measures, but nothing at the top
    * level said fidelity had collapsed; a reader saw 417 s and no flag).
    * "full" only when EVERY query reached mode=full; otherwise the
    * mode histogram inline, so the artifact itself says how much of it
    * is min-of-warm evidence vs cold one-shots. Pure, BenchSpec-pinned. */
  def fidelityOf(queryModes: Map[String, String]): String = {
    val full = queryModes.valuesIterator.count(_ == "full")
    if (queryModes.nonEmpty && full == queryModes.size) "full"
    else {
      val deg = queryModes.valuesIterator.count(_ == "degraded")
      val min = queryModes.valuesIterator.count(_ == "minimal")
      s"partial(full=$full,degraded=$deg,minimal=$min)"
    }
  }

  /** Single-run stall cap (round 21, the r20 verdict's task 1a: ONE
    * 121 s cold-run stall — 18.9x the committed cold — ate 29% of the
    * round's budget and starved every warm pass): the wall-clock
    * ceiling for one timed run, `capFactor` x the best cold evidence
    * available (the committed quiet-box reference's cold estimate
    * and/or this session's own cold observation — the MAX, so a query
    * whose fixture legitimately grew since the reference isn't capped
    * against stale evidence), floored at `floorS` so timer jitter
    * can't cap a sub-second query. None (no evidence yet — a new
    * query's first cold run) = uncapped: a first observation must
    * never be judged against nothing. Pure, BenchSpec-pinned. */
  def capSeconds(refColdEst: Option[Double], ownCold: Option[Double],
                 capFactor: Double, floorS: Double): Option[Double] =
    (refColdEst.toSeq ++ ownCold.toSeq).maxOption
      .map(c => math.max(floorS, capFactor * c))

  /** Run `action` under a hard wall-clock cap: a watchdog cancels the
    * run's job group when `capS` elapses first, and the sample reports
    * Left (recorded as a capped sample, never a timing). Cancellation
    * reaches running STAGES (interruptOnCancel); a stall in pure
    * driver-side planning is not interruptible — the watchdog still
    * bounds the damage the moment the plan submits a job. The cap
    * aborts the ACTION only: the sweep continues with the next run,
    * which is the whole point (the alternative was one stall starving
    * 199 queries' warm budget). */
  def runCapped(spark: SparkSession, desc: String, capS: Option[Double])
               (action: => Unit): Either[String, Unit] = capS match {
    case None => Right(action)
    case Some(cap) =>
      val sc = spark.sparkContext
      val group = s"graft-bench-cap-$desc-${System.nanoTime()}"
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      sc.setJobGroup(group, desc, interruptOnCancel = true)
      val timer = new java.util.Timer(s"graft-bench-watchdog", true)
      timer.schedule(new java.util.TimerTask {
        override def run(): Unit = { fired.set(true); sc.cancelJobGroup(group) }
      }, math.max(1L, (cap * 1000).toLong))
      try {
        action
        Right(())
      } catch {
        case e: Throwable if fired.get() =>
          Left(f"capped: run exceeded ${cap}%.1f s stall ceiling " +
            s"(${e.getClass.getSimpleName}); see bench_reference.json cold basis")
      } finally {
        timer.cancel()
        sc.clearJobGroup()
      }
  }

  /** Per-query methodology annotations shipped in bench_detail.json's
    * `notes` field: when a round RE-SCOPES what a query's timed body
    * covers, automated cross-round diffing would otherwise read the
    * discontinuity as a regression-free speedup (or a regression).
    * One line per affected query, permanent once added. */
  val MethodologyNotes: Map[String, String] = Map(
    "q_dedup_cluster_incr" -> ("timed body re-scoped in r16: the base CC assignment " +
      "and mined batch pairs moved into a persisted fixture, so the number is the " +
      "per-batch absorb only — not comparable to pre-r16 rounds"),
    "q_cdc_sql_alter" -> ("timed body re-scoped in r19: quarter-keyed 4-bucket CTAS " +
      "and an id%8 backfill replace the full-table lifecycle — the DDL semantics " +
      "gate is unchanged but the number is not comparable to r18"),
    "q_cdc_sql_clean" -> ("timed body re-scoped in r19: 4-bucket CTAS and point-key " +
      "UPDATE commits replace the %3-spread updates — the retention lifecycle gate " +
      "is unchanged but the number is not comparable to r18"))

  /** The full-fidelity record written to bench_detail.json: every query's
    * min-of-N headline, the (min,max,n,mode) spread, and complete error
    * text. `queryModes`: full = warm runs >= nRuns (min excludes every
    * first-run cost), degraded = at least one warm run, minimal = the
    * cold coverage-sweep run only (fixture builds/codegen land IN the
    * number — disclosed per query so cross-round comparisons can filter
    * to comparables without inference). */
  def detailJson(results: Seq[(String, Either[String, Seq[Double]])],
                 sfDir: String, nRuns: Int,
                 modes: Map[String, Int] = Map.empty,
                 queryModes: Map[String, String] = Map.empty,
                 coldTimes: Map[String, Double] = Map.empty,
                 label: Option[(Double, Boolean)] = None,
                 capped: Map[String, Int] = Map.empty): String = {
    val spread = results.collect { case (k, Right(ts)) =>
      val m = queryModes.get(k).map(m => s""","mode":"$m"""").getOrElse("")
      // capped = samples the stall watchdog aborted (excluded from
      // min/max/n — they are not timings); disclosed per query so a
      // partially-capped query can't read as clean full fidelity
      val c = capped.get(k).filter(_ > 0).map(n => s""","capped":$n""").getOrElse("")
      s"""\"$k\":{"min":${f(ts.min)},"max":${f(ts.max)},"n":${ts.size}$m$c}"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => s"\"${k}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(ts)) => ts.min }.sum
    val nErr = results.count(_._2.isLeft)
    val modesField = if (modes.isEmpty) "" else
      modes.toSeq.sortBy(_._1).map { case (k, v) => s"\"$k\":$v" }
        .mkString(""","modes":{""", ",", "}")
    val notes = MethodologyNotes.filter { case (k, _) => results.exists(_._1 == k) }
    val notesField = if (notes.isEmpty) "" else
      notes.toSeq.sortBy(_._1).map { case (k, v) => s"\"$k\":\"${esc(v)}\"" }
        .mkString(""","notes":{""", ",", "}")
    // the raw cold-sweep costs (pass 1): fixture builds + first-use
    // codegen land in these — never comparable to warm mins, exported
    // so the NEXT quiet-box sweep can regenerate bench_reference.json's
    // cold_factor (scripts/gen_bench_reference.py) and so a degraded
    // run's inflation is inspectable per query
    val coldField = if (coldTimes.isEmpty) "" else
      coldTimes.toSeq.sortBy(_._1).map { case (k, v) => s"\"$k\":${f(v)}" }
        .mkString(""","cold":{""", ",", "}")
    val labelField = label.map { case (cf, deg) =>
      s""","contention_factor":${f(cf)},"degraded":$deg""" }.getOrElse("")
    val fidField =
      if (queryModes.isEmpty) ""
      else s""","fidelity":"${fidelityOf(queryModes)}""""
    s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${
      results.map { case (k, v) => s"\"$k\":" + v.map(ts => f(ts.min)).getOrElse("-1.0") }
        .mkString("{", ",", "}")
    },"spread":$spread,"errors":$errors,"n_errors":$nErr$modesField$notesField$coldField$labelField$fidField,"timing":"cold_coverage_sweep_then_${nRuns}_warm_rounds_cost_ascending_budget_fit_plus_extra_over_1s_min_of_warm_clearcache_per_iter","sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Quiet the WindowExec "No Partition Defined" warning wall: all 11
    // global Window.orderBy sites in the suite rank BOUNDED inputs
    // (≤64-row offset tables, rank lists — audited r16), so the warning
    // is noise that buries real tail output in every bench log.
    // (package-level: Logging names loggers by the CONCRETE class, so
    // WindowExec and WindowExecBase both need covering)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    // Wall-clock budget for the WHOLE sweep (seconds), measured from
    // here (Spark session is up; sbt/JVM startup is outside our
    // control). Round 14's driver bench died at rc 124 with NOTHING on
    // stdout — the full-fidelity protocol outgrew the kill window at
    // 228 queries. Two independent defenses, both pinned in BenchSpec:
    // (1) fitRound schedules each warm round inside this budget, so
    // the sweep finishes and covers EVERY query (the cold sweep runs
    // unconditionally — coverage first); (2) a shutdown hook (below)
    // emits a partial-but-parseable stdout line + detail file if the
    // JVM is killed anyway.
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
    // Per-query state, mutated single-threaded under `lock` so the
    // shutdown hook can snapshot a consistent view: `cold` holds the
    // coverage-sweep run (pass 1), `warm` the timed rounds (pass 2+),
    // `est` the latest observed wall cost driving fitRound projections.
    val lock = new Object
    val cold = scala.collection.mutable.LinkedHashMap[String, Either[String, Double]]()
    val warm = scala.collection.mutable.LinkedHashMap[String, Vector[Either[String, Double]]]()
    val est = scala.collection.mutable.Map[String, Double]()
    // per-query count of watchdog-capped samples (round 21, task 1a) —
    // declared with the rest of the lock-guarded state so the shutdown
    // hook can snapshot it
    val cappedCounts = scala.collection.mutable.Map[String, Int]()
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    def modeOf(n: String): String = {
      // fidelity = warm SUCCESSES, not attempts: a query whose warm
      // runs all errored falls back to its cold-run headline, and
      // labeling that "full" would break the contract cross-round
      // comparisons filter on (full = min excludes first-run costs)
      val ok = warm.getOrElse(n, Vector.empty).count(_.isRight)
      if (ok >= nRuns) "full" else if (ok > 0) "degraded" else "minimal"
    }
    // Headline timings per query: the WARM successes when any exist (the
    // cold run carries fixture builds / first-use codegen — never let it
    // into a mode>=degraded number), else the cold run, else the first
    // error. Queries the kill reached before pass 1 are absent (the
    // partial marker discloses coverage).
    def collectResults(): (Seq[(String, Either[String, Seq[Double]])], Map[String, String]) =
      lock.synchronized {
        val rs = cold.keysIterator.toSeq.map { n =>
          val w = warm.getOrElse(n, Vector.empty)
          val wOk = w.collect { case Right(t) => t }
          val r: Either[String, Seq[Double]] =
            if (wOk.nonEmpty) Right(wOk)
            else cold(n) match {
              case Right(t) => Right(Seq(t))
              case Left(e) =>
                Left(w.collectFirst { case Left(e2) => e2 }.getOrElse(e))
            }
          n -> r
        }
        (rs, cold.keysIterator.map(n => n -> modeOf(n)).toMap)
      }
    // Self-labeling state: the committed quiet-box reference, loaded
    // once and gated on THIS run's scale factor (an sf0.01 smoke run
    // must never be scored against sf0.1 reference mins); the (cold
    // map, contention label) snapshot is recomputed at emit time so
    // even the shutdown hook's partial artifact carries the label its
    // completed cold runs support.
    val reference = loadReference().filter { case (_, _, refSf) =>
      sfDir.split("/").lastOption.contains(refSf)
    }
    def labelSnapshot(): (Map[String, Double], Option[(Double, Boolean)]) =
      lock.synchronized {
        val coldTimes = cold.collect { case (n, Right(t)) => n -> t }.toMap
        val lbl = reference.flatMap { case (ref, cf, _) =>
          contentionFactor(ref, coldTimes, cf).map(fct => (fct, fct > DegradedAt))
        }
        (coldTimes, lbl)
      }
    // Shutdown hook, registered BEFORE any query runs (a kill during
    // the multi-second warm-up/startup phase must still produce a
    // parseable line — the round-14 kill test caught exactly that
    // hole): if the driver SIGTERMs the JVM mid-sweep (rc 124,
    // round 14), the hook emits a stdout line flagged "partial" and a
    // detail file from whatever completed — a truncated sweep beats an
    // empty artifact. The hook only prints; it does NOT spark.stop()
    // (slow, and Spark registers its own stop hook).
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val detailPath = java.nio.file.Paths.get("bench_detail.json").toAbsolutePath
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!finished.get()) {
        val (partial, pModes) = collectResults()
        val counts = pModes.values.groupBy(identity).map { case (k, v) => k -> v.size }
        val (coldTimes, label) = labelSnapshot()
        val cappedSnap = lock.synchronized(cappedCounts.toMap)
        try java.nio.file.Files.write(detailPath,
          (detailJson(partial, sfDir, nRuns, counts, pModes, coldTimes, label,
            cappedSnap) + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
        println(stdoutLine(partial, sfDir, partialOf = Some(ordered.size), label = label,
          fidelity = Some(fidelityOf(pModes))))
        System.out.flush()
      }
    }))
    // Untimed warmup at the smallest SF: pays the one-time JIT/codegen/
    // planner costs so per-query timings measure the queries, not JVM
    // cold start (standard benchmarking practice).
    val jvmWarmList = Seq("q_agg_hash", "q_win_analytic", "q_dedup_ngram", "q_join_broadcast")
    jvmWarmList.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Timing protocol (round 16 — fixes the round-15 fidelity collapse
    // where an online per-query degrade left 205/229 queries at n=1 and
    // 94 cold):
    //   pass 1  COLD COVERAGE SWEEP — every query exactly once, suite
    //           order, ALWAYS (coverage beats budget adherence; the
    //           driver kill window is the real backstop). Pays fixture
    //           builds + per-query codegen and yields a per-query cost
    //           estimate.
    //   pass 2  WARM BLOCKS — a UNIFORM tier (warmTier: the largest
    //           t <= nRuns whose t·estSum projection fits) of
    //           back-to-back runs per query in suite order, so every
    //           query's fidelity degrades together and each min is
    //           measured against its own page-cache-warm inputs. If
    //           even t=1 doesn't fit, the cheapest prefix (fitRound)
    //           still gets a warm number.
    //   top-up  leftover budget raises below-nRuns queries to nRuns,
    //           cheapest first. Min-of-warm is the headline; the
    //           spread (min,max,n,mode) ships per query.
    //   extras  queries whose warm min >= 1 s get up to nExtra more
    //           runs in leftover budget (within-run spread reached
    //           3.2x max/min on multi-second queries at n=3).
    val extraRunsOverSecs = 1.0
    val nExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA", "2").toInt.max(0)
    // Single-run stall cap (round 21, task 1a — see [[capSeconds]] /
    // [[runCapped]]): one 121 s stall in r20 starved 199 queries' warm
    // budget. capFactor x the best cold evidence, 15 s floor; capped
    // samples are recorded per query (never as timings) and scheduling
    // falls back to the reference estimate.
    val capFactor = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP_FACTOR", "5.0").toDouble
    val capFloorS = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP_FLOOR_S", "15").toDouble
    def refColdEst(name: String): Option[Double] =
      reference.flatMap { case (ref, cf, _) => ref.get(name).map(_ * cf) }
    def capFor(name: String): Option[Double] = {
      val ownCold = lock.synchronized(cold.get(name)).flatMap(_.toOption)
      capSeconds(refColdEst(name), ownCold, capFactor, capFloorS)
    }
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      // noop sink, NOT .count(): count() lets Catalyst prune any
      // aggregate expression the final projection doesn't force and
      // eliminate top-level sorts, under-timing exactly that work (a
      // bare multi-distinct agg measures 0.2 s under count() vs 6.3 s
      // executed — the scale-probe lesson, round 14). The noop write
      // runs the full physical plan and discards rows.
      val r = try {
        runCapped(spark, name, capFor(name)) {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } match {
          case Right(_) => Right((System.nanoTime() - t0) / 1e9)
          case Left(capMsg) =>
            lock.synchronized { cappedCounts(name) = cappedCounts.getOrElse(name, 0) + 1 }
            Left(capMsg)
        }
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
      // r21 twin of the above for localCheckpoint blocks: clearCache()
      // only drops SQL caches; checkpointed RDD blocks from finished
      // iterations linger until a GC lets the ContextCleaner reclaim
      // them, and across a 244-query sweep the accumulation evicts
      // storage memory and creeps the cache-reusing tail upward
      // (measured +0.1→+0.8 s base→final on q_heavy_hitters_cms,
      // q_text_search, q_pipeline_rag et al. as the round-21 sweeps
      // accumulated more checkpoints). Nothing from a finished run may
      // carry into the next — the same no-cross-run-cache rule.
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      r
    }
    val fns = ordered.toMap
    def timed(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      val r = once(name, fns(name))
      val wall = (System.nanoTime() - t0) / 1e9
      lock.synchronized {
        est(name) = r match {
          // a capped run must not poison the projections with the stall
          // it just aborted — schedule from the reference cold estimate
          // (task 1a's fallback) when one exists, else the cap wall
          case Left(m) if m.startsWith("capped:") => refColdEst(name).getOrElse(wall)
          case _ => wall
        }
      }
      r
    }
    // scheduling estimates with the contended-box correction: cold
    // costs of never-warmed queries are deflated by the median
    // observed warm/cold ratio (see deflateColdEsts) — on a loaded box
    // the cold sweep over-measures by 20-60x and the uncorrected
    // projections starve the warm passes (the BENCH_r18 failure)
    def effEsts(): Map[String, Double] = lock.synchronized {
      val coldTimes = cold.collect { case (n, Right(t)) => n -> t }.toMap
      val hasWarm = warm.filter(_._2.exists(_.isRight)).keys.toSet
      deflateColdEsts(coldTimes, est.toMap, hasWarm)
    }
    // pass 1 — cold coverage sweep (suite order; _ORDER=reverse probes
    // suite-position effects)
    ordered.foreach { case (name, _) =>
      val r = timed(name)
      lock.synchronized { cold(name) = r }
    }
    // pass 2 — the warm BLOCK pass: a uniform tier of back-to-back
    // runs per query, suite order. Back-to-back matters: a query's
    // inputs are page-cache-warm from its own previous iteration, so
    // min-of-block measures steady state (the first full-suite
    // round-robin draft measured a uniform 1.27x vs r14's adjacent-run
    // protocol — the 229 queries in between evicted each query's
    // inputs). The tier is chosen globally (warmTier), so fidelity
    // degrades uniformly, never as an alphabetic stripe.
    val tier = {
      val estSum = lock.synchronized(cold.keysIterator.map(est(_)).sum)
      warmTier(estSum, nRuns, budgetS - elapsedS)
    }
    if (tier == 0) {
      // can't afford even one uniform warm pass against the COLD
      // estimates: cheapest-prefix coverage so as many queries as
      // possible still get a warm number. The prefix self-corrects —
      // each warm run updates its query's estimate, and the top-up
      // rounds below re-fit against deflated projections, so a
      // contended cold sweep no longer freezes the whole round at n=1.
      val cands = lock.synchronized(cold.keysIterator.toSeq.map(n => n -> est(n)))
      fitRound(cands, budgetS - elapsedS).foreach { n =>
        if (elapsedS + est(n) <= budgetS) {
          val r = timed(n)
          lock.synchronized { warm(n) = warm.getOrElse(n, Vector.empty) :+ r }
        }
      }
    } else ordered.foreach { case (n, _) =>
      if (cold.contains(n)) {
        // drift guard: prefer a 1-run block over skipping outright
        val runs = if (elapsedS + tier * est(n) <= budgetS) tier
                   else if (elapsedS + est(n) <= budgetS) 1 else 0
        (1 to runs).foreach { _ =>
          val r = timed(n)
          lock.synchronized { warm(n) = warm.getOrElse(n, Vector.empty) :+ r }
        }
      }
    }
    // top-up rounds — leftover budget raises below-nRuns queries,
    // cheapest first (covers tier < nRuns and drift-guard stragglers);
    // projections use the deflated estimates so cold-sweep inflation
    // on a contended box can't starve the later rounds
    for (round <- 1 to nRuns) {
      val cands = {
        val eff = effEsts()
        lock.synchronized {
          cold.keysIterator.toSeq.filter(n => warm.getOrElse(n, Vector.empty).size < round)
            .map(n => n -> eff.getOrElse(n, est(n)))
        }
      }
      fitRound(cands, budgetS - elapsedS).foreach { n =>
        // per-ADMISSION projection, recomputed (the r19 advice finding:
        // one per-round eff snapshot went stale as est() updated run by
        // run — on a still-contended box a single mis-deflated query
        // could overrun the round by 20x its projection). Each admitted
        // run updates its query's estimate AND the deflation ratio, so
        // the next admission projects from the freshest evidence.
        val proj = effEsts().getOrElse(n, lock.synchronized(est(n)))
        if (elapsedS + proj <= budgetS) {
          val r = timed(n)
          lock.synchronized { warm(n) = warm.getOrElse(n, Vector.empty) :+ r }
        }
      }
    }
    // extras — tighten the slow tail's min in leftover budget
    for (x <- 1 to nExtra) {
      val cands = lock.synchronized {
        cold.keysIterator.toSeq.filter { n =>
          val w = warm.getOrElse(n, Vector.empty)
          val oks = w.collect { case Right(t) => t }
          w.size == nRuns + x - 1 && oks.nonEmpty && oks.min >= extraRunsOverSecs
        }.map(n => n -> est(n))
      }
      fitRound(cands, budgetS - elapsedS).foreach { n =>
        if (elapsedS + est(n) <= budgetS) {
          val r = timed(n)
          lock.synchronized { warm(n) = warm.getOrElse(n, Vector.empty) :+ r }
        }
      }
    }
    val (results, qModes) = collectResults()
    val modeCounts = qModes.values.groupBy(identity).map { case (k, v) => k -> v.size }
    val (coldTimes, label) = labelSnapshot()
    java.nio.file.Files.write(detailPath,
      (detailJson(results, sfDir, nRuns, modeCounts, qModes, coldTimes, label,
        lock.synchronized(cappedCounts.toMap)) + "\n")
        .getBytes("UTF-8"))
    // complete line FIRST, finished-flag second: a kill landing between
    // the two re-prints a partial line after the complete one (harmless
    // — same coverage), whereas the opposite order could die with
    // nothing on stdout
    println(stdoutLine(results, sfDir, label = label,
      fidelity = Some(fidelityOf(qModes))))
    System.out.flush()
    finished.set(true)
    spark.stop()
  }
}
