package graft.queries

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Regression pin: every declared query runs at sf0.001 and returns
  * exactly its golden row count (captured from an oracle-green run).
  * Catches silent semantic drift between rounds without needing DuckDB
  * in the sbt loop. The driver's DuckDB gate remains the value-level
  * check; this is the cheap structural one.
  */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ONE source of truth, machine-refreshed: `sbt "runMain graft.GoldenGen"`
  // regenerates the resource from an oracle-green tree (the hand-kept
  // twin of this map went stale twice — a declared query with no golden
  // entry shipped two rounds red). The sync test below stays the
  // tripwire for a query added without regenerating.
  private val golden: Map[String, Long] = {
    val in = getClass.getResourceAsStream("/golden_sf0.001.json")
    assert(in != null, "missing resource golden_sf0.001.json — run graft.GoldenGen")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  test("every GQuery is declared in the golden map and vice versa") {
    assert(golden.nonEmpty)
    assert(GQuery.all.map(_.name).toSet == golden.keySet)
  }

  test("PLANS.md covers the full query registry (regen tripwire)") {
    // The plan-evidence discipline only works if the table covers every
    // declared query — it went stale twice when queries landed without
    // a regen (128 rows vs 131 in round 11). Regen:
    //   spark-shell --driver-class-path target/scala-2.13/classes \
    //     -I scripts/gen_plans.scala
    val plansFile = new java.io.File("PLANS.md")
    assert(plansFile.exists, "PLANS.md missing — run scripts/gen_plans.scala")
    val src = scala.io.Source.fromFile(plansFile, "UTF-8")
    val rows = try src.getLines()
      .filter(_.startsWith("| "))
      .map(_.split("\\|")(1).trim).toSet
    finally src.close()
    val missing = GQuery.all.map(_.name).toSet -- rows
    assert(missing.isEmpty,
      s"PLANS.md is stale — missing ${missing.toSeq.sorted.mkString(", ")}; " +
        "regen with scripts/gen_plans.scala")
  }

  // ---- physical-plan regression pins (the perf claims in SCALE.md) ----
  private def plan(name: String): String =
    GQuery.all.find(_.name == name).get.fn(spark, dir)
      .queryExecution.executedPlan.treeString

  test("q_join_broadcast: three broadcast joins, no shuffle join") {
    val p = plan("q_join_broadcast")
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) == 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_join_asof: linear plan — no nested-loop join, one hash shuffle") {
    val p = plan("q_join_asof")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("q_join_lateral: decorrelated to WindowGroupLimit + hash join, no nested loop") {
    val p = plan("q_join_lateral")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_sim_mrl: WindowGroupLimit candidate cut, no cartesian corpus pairing") {
    val p = plan("q_sim_mrl")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_agg_topk_typed: ObjectHashAggregate partial→final, no window exchange of raw rows") {
    val p = plan("q_agg_topk_typed")
    // partial + final instances of the typed aggregate
    assert(p.split("\n").count(_.contains("ObjectHashAggregate")) >= 2, p)
    assert(!p.contains("Window"), p) // the rank-window alternative must be absent
  }

  test("q_agg_multi_distinct: one Expand plan, not k separate passes") {
    val p = plan("q_agg_multi_distinct")
    assert(p.contains("Expand"), p)
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1, p)
  }

  test("q_privacy_kanon: one QI-key hash exchange") {
    val p = plan("q_privacy_kanon")
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("q_ts_sweepline: reused subtrees are materialized, not re-derived per consumer") {
    // r21: the shared subtrees moved from a lazy cache (whose fill the
    // concurrent consumers raced and duplicated) to an eager
    // localCheckpoint — the pin is the same property (consumers read a
    // materialized subtree instead of re-deriving the union from
    // source): the returned plan scans the checkpointed RDD and
    // contains NO parquet re-scan of the events source.
    val p = plan("q_ts_sweepline")
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("FileScan parquet"), p)
  }

  test("q_hybrid_rrf: no cartesian corpus pairing; map-side TakeOrdered cut on the vector leg") {
    val p = plan("q_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_sort_limit: TakeOrderedAndProject, zero exchanges") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q_scan_project: column-pruned scan (4 of 11 lineitem columns)") {
    val p = plan("q_scan_project")
    val scan = p.split("\n").find(_.contains("FileScan parquet")).get
    assert(scan.contains("l_orderkey") && !scan.contains("l_shipdate"), scan)
  }

  test("q_dedup_minhash: single documents scan (shingles ride the band stream)") {
    val p = plan("q_dedup_minhash")
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1, p)
  }

  test("q_decontaminate: single documents scan (train/test tag rides the postings)") {
    val p = plan("q_decontaminate")
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1, p)
  }

  test("q_win_percentile: row-level window is bucket-partitioned, offsets come from an aggregate") {
    // r21: the query materializes its windowed result before the
    // presentation sort (localCheckpoint), so the returned plan shows
    // only Sort-over-RDD; the pinned properties live in the
    // checkpoint's OWN execution — captured via a QueryExecution
    // listener while the query builds.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.treeString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      GQuery.all.find(_.name == "q_win_percentile").get.fn(spark, dir)
      // listener events are posted asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (!plans.asScala.exists(_.contains("row_number")) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally spark.listenerManager.unregister(l)
    val p = plans.asScala.find(_.contains("row_number")).getOrElse(
      fail("no captured execution contains the row-level window"))
    // the per-row sort must be partitioned by (priority, bucket), never
    // by the 5-value priority alone — that's the n/5 skew monster
    val rowWin = p.split("\n").find(l => l.contains("Window") && l.contains("row_number")).get
    assert(rowWin.contains("bkt"), rowWin)
    // the offsets/totals come from a count aggregate, not a raw-row window
    assert(p.contains("HashAggregate"), p)
    // broadcast offsets, never a shuffle merge (the captured AQE tree
    // prints final + initial sections, so pin presence, not count)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("q_cdc_filegroup_upsert: manifest-resolved read is scan+sort only (no shuffle merge)") {
    // the whole point of file-group COW: merge cost was paid at commit
    // time; the read is a multi-path scan with zero hash exchanges
    val p = plan("q_cdc_filegroup_upsert")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1, p)
  }

  test("q_tfidf: one corpus scan (inverted index materialized, not re-derived per consumer)") {
    val p = plan("q_tfidf")
    // the only FileScan is the count(*) metadata scan; terms come from
    // the checkpointed RDD
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1, p)
    assert(!p.contains("SortMergeJoin"), p) // df join broadcasts or hashes, never sorts the corpus
  }

  test("q_pack_shards: the corpus cumsum window is bucket-partitioned, not global") {
    val p = plan("q_pack_shards")
    val wins = p.split("\n").filter(_.contains("windowspecdefinition"))
    assert(wins.length == 2, p) // per-bucket cumsum + <=nb-row offsets
    // the per-doc running sum partitions by the bucket THEN orders by
    // doc_id — an unpartitioned spec here is the corpus-in-one-partition
    // regression this pin exists to catch
    assert(wins.exists(_.matches(""".*windowspecdefinition\(b#\d+L?, doc_id#\d+L? ASC.*""")),
      wins.mkString("\n"))
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 0, p) // checkpointed token table
  }

  test("q_chunk_docs: narrow chunker — no hash exchange, single corpus scan") {
    val p = plan("q_chunk_docs")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1, p)
  }

  test("q_tpch_q10: one hash exchange, broadcast dims, TakeOrdered") {
    val p = plan("q_tpch_q10")
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_tpch_q4: the EXISTS rewrite is a semi hash join, not a nested loop") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_tpch_q19: the disjunction's per-side hulls reach both parquet scans") {
    // the hand-applied Q19 rewrite: without the redundant hull conjuncts
    // the OR-of-ANDs is only evaluable above the join and both scans
    // read everything. PushedFilters must show the quantity bound on
    // lineitem and the brand IN-list on part.
    val q = GQuery.all.find(_.name == "q_tpch_q19").get.fn(spark, dir)
    val scans = q.queryExecution.executedPlan.toString.split("\n")
      .filter(_.contains("PushedFilters"))
    assert(scans.exists(s => s.contains("l_quantity") && s.contains("GreaterThanOrEqual")), scans.mkString("\n"))
    assert(scans.exists(s => s.contains("p_brand") && s.contains("In(")), scans.mkString("\n"))
  }

  test("q_tpch_q22: scalar threshold broadcasts; anti join is hash, not loop") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), p)
    // the ONLY nested-loop is the 1-row scalar-threshold broadcast; the
    // anti join itself must be a hash/merge join on custkey
    assert(p.split("\n").count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("\n").exists(l => l.contains("LeftAnti") && !l.contains("NestedLoop")), p)
  }

  test("q_tpch_q2: decorrelated min is one part-key window; dim filters reach the scans") {
    val p = plan("q_tpch_q2")
    // the correlated scalar subquery is served by a per-part min window,
    // not an agg + self-join — exactly one window, no loop joins anywhere
    assert(p.split("\n").count(_.contains("Window")) == 1, p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("EqualTo(r_name,EUROPE)")), scans.mkString("\n"))
    assert(scans.exists(_.contains("EqualTo(p_type,PROMO)")), scans.mkString("\n"))
  }

  test("q_tpch_q21: EXISTS and NOT EXISTS are hash semi/anti joins with residuals, not loops") {
    val p = plan("q_tpch_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the flagged slice's returnflag filter is pushed into the fact scans
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("EqualTo(l_returnflag,R)")), scans.mkString("\n"))
    assert(scans.exists(_.contains("EqualTo(o_orderstatus,F)")), scans.mkString("\n"))
  }

  test("q_tpch_q6: all three predicates pushed into one scan; no joins, no exchange but the 1-row agg") {
    val q = GQuery.all.find(_.name == "q_tpch_q6").get.fn(spark, dir)
    val p = q.queryExecution.executedPlan
    assert(!p.treeString.contains("Join"), p.treeString)
    // treeString truncates long filter lists — read the scan's own
    // metadata for the full PushedFilters string (descending through
    // the AQE wrapper, which hides its inner plan from collect)
    def scansOf(pl: org.apache.spark.sql.execution.SparkPlan): Seq[String] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(s.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s.metadata("PushedFilters"))
      case other => other.children.flatMap(scansOf)
    }
    val pushed = scansOf(p)
    assert(pushed.length == 1, p.treeString)
    for (want <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(pushed.head.contains(want), s"missing pushed filter $want in ${pushed.head}")
  }

  test("q_tpch_q11: the fraction threshold is a 1-row scalar broadcast; nation filter pushed") {
    val p = plan("q_tpch_q11")
    // the only loop join is the 1-row scalar total (the q_tpch_q22 rule)
    assert(p.split("\n").count(l => l.contains("NestedLoop") || l.contains("Cross")) <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("EqualTo(s_nationkey,3)")), scans.mkString("\n"))
  }

  test("q_tpch_q13: outer join keeps the zero bucket; priority filter pushed; no loops") {
    val p = plan("q_tpch_q13")
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("Not(EqualTo(o_orderpriority,3-MEDIUM))")), scans.mkString("\n"))
  }

  test("q_tpch_q15: the max is a 1-row scalar broadcast, not a global window") {
    val p = plan("q_tpch_q15")
    assert(!p.contains("Window"), p)
    // the only cross join is the 1-row scalar max (the q_tpch_q22 rule)
    assert(p.split("\n").count(l => l.contains("Cross") || l.contains("NestedLoop")) <= 1, p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.count(_.contains("GreaterThanOrEqual(l_shipdate")) == 2,
      "both view evaluations must scan the date-pruned slice:\n" + scans.mkString("\n"))
  }

  test("q_tpch_q16: NOT IN is a hash anti join; brand/size filters reach the part scan") {
    val p = plan("q_tpch_q16")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(s => s.contains("Not(EqualTo(p_brand,Brand#13))") && s.contains("In(p_size")), scans.mkString("\n"))
    assert(scans.exists(_.contains("LessThan(s_acctbal,0.0)")), scans.mkString("\n"))
  }

  test("q_tpch_q17: the correlated avg is one part-key window; brand filter pushed") {
    val p = plan("q_tpch_q17")
    assert(p.split("\n").count(_.contains("Window")) == 1, p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("EqualTo(p_brand,Brand#21)")), scans.mkString("\n"))
  }

  test("q_tpch_q8: both share legs aggregate in one pass; type/date/region filters pushed") {
    val p = plan("q_tpch_q8")
    // numerator (nation-cased) and denominator (all-volume) ride ONE
    // aggregate over the joined slice — a second scan/join tree here is
    // the regression this pin catches (8 = the 7 tables + nation's
    // second role; a doubled tree would show 14+)
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 8, p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("EqualTo(p_type,ECONOMY)")), scans.mkString("\n"))
    assert(scans.exists(_.contains("EqualTo(r_name,AMERICA)")), scans.mkString("\n"))
    assert(scans.exists(_.contains("GreaterThanOrEqual(o_orderdate")), scans.mkString("\n"))
  }

  test("q_tpch_q9: LIKE prunes the part scan; all dims broadcast; no loops") {
    val p = plan("q_tpch_q9")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) >= 2, p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("StringContains(p_name,widget)")), scans.mkString("\n"))
  }

  test("q_tpch_q20: one bridge pass (no second fact scan); both IN levels are semi hash joins") {
    val p = plan("q_tpch_q20")
    // avail + the 1996 slice come from ONE conditional-sum aggregate:
    // exactly two lineitem/fact scans would mean the correlated sum
    // re-scanned the fact — pin the single-scan shape
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 5, p)
    assert(p.split("\n").count(_.contains("LeftSemi")) >= 3, p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.split("\n").filter(_.contains("PushedFilters"))
    assert(scans.exists(_.contains("StringStartsWith(p_name,cold)")), scans.mkString("\n"))
    assert(scans.exists(_.contains("EqualTo(r_name,ASIA)")), scans.mkString("\n"))
  }

  test("q_join_bucketed: zero exchanges for join AND aggregate with broadcasts off") {
    // the pay-shuffle-once claim: both bucketed scans satisfy the join's
    // and the groupBy's required distribution, so with the broadcast
    // shortcut disabled the whole plan still contains no exchange at all
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("q_join_bucketed")
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(p.contains("SortMergeJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("pure-scalar queries stay inside whole-stage codegen") {
    // the '*(n)' prefix marks operators fused into a codegen stage; a
    // non-codegen expression slipping into these hot scalar paths would
    // drop the marker. (The HOF-based text queries are EXPECTED to be
    // interpreted — CodegenFallback, see README design notes — so only
    // the pure-scalar paths are pinned.)
    for (q <- Seq("q_case_when", "q_filter_pred", "q_scan_project", "q_math_funcs")) {
      // AQE prints codegen markers only once the plan is final — drive
      // THIS DataFrame's own execution (count() would plan a new one)
      val df = GQuery.all.find(_.name == q).get.fn(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), s"$q lost whole-stage codegen:\n$p")
    }
  }

  test("bloom queries: the 'join' is a scan predicate — zero join operators") {
    // r21: the sketch arrives as a bloom_filter_agg SCALAR SUBQUERY
    // (the native InjectRuntimeFilter shape) instead of a driver
    // collect + multi-MB plan literal — the subquery contributes its
    // own build-side scan to the tree, so the main-scan pin counts
    // scans OUTSIDE the subquery sections.
    for (q <- Seq("q_join_bloom", "q_decontaminate_bloom")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      assert(p.contains("might_contain"), s"$q lost the bloom scan predicate:\n$p")
      assert(p.contains("Subquery"), s"$q lost the scalar-subquery sketch:\n$p")
      // two scans total: the probed side + the sketch build inside the
      // subquery (the literal shape had one visible scan because the
      // build ran as a separate driver collect BEFORE the query)
      assert(p.split("\n").count(_.contains("FileScan parquet")) == 2,
        s"$q should scan probe side + sketch build exactly once each:\n$p")
    }
  }

  test("q_sim_topk: queries broadcast, corpus streamed, partial top-k cut before the shuffle") {
    // round-14 verdict: the sides were inverted (corpus broadcast) — a
    // multi-GB ship to every task at 100x data. Pin: exactly one
    // broadcast and its subtree carries the vec_id<=50 QUERY filter;
    // the corpus is cut to a per-partition top-5 (Partial
    // WindowGroupLimit) before the one query-key exchange.
    val p = plan("q_sim_topk")
    assert(p.split("\n").count(_.contains("BroadcastExchange")) == 1, p)
    assert(p.substring(p.indexOf("BroadcastExchange")).contains("<= 50"), p)
    assert(p.contains("row_number(), 5, Partial"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_layout_zorder: corpus rank is two-level — no corpus-sized global window, no ntile") {
    // round-14 verdict: ntile(64) over a GLOBAL window put the whole
    // fact through one WindowExec partition. Pin on the optimized
    // logical plan: the corpus row_number window must be PARTITIONED
    // (by the z-bucket); any window with an empty partition spec must
    // be one of the <=nb-row offset-table windows (sum over bucket
    // counts), never a row_number over the fact.
    val df = GQuery.all.find(_.name == "q_layout_zorder").get.fn(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty)
    assert(!df.queryExecution.optimizedPlan.toString.contains("ntile"),
      df.queryExecution.optimizedPlan.toString)
    val rowNumWins = wins.filter(_.windowExpressions.mkString.contains("row_number"))
    assert(rowNumWins.nonEmpty && rowNumWins.forall(_.partitionSpec.nonEmpty),
      df.queryExecution.optimizedPlan.toString)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.windowExpressions.mkString.contains("sum"),
        s"unexpected global window:\n$w")
    }
  }

  test("stream_session_e2e equals the batch q_win_session rows (shared columns)") {
    // the streaming state machine and the batch gaps-and-islands window
    // must agree row for row — the spec-level twin of the DuckDB gate
    val stream = GQuery.all.find(_.name == "stream_session_e2e").get.fn(spark, dir)
      .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
      .collect().map(_.toSeq).toSeq
    val batch = GQuery.all.find(_.name == "q_win_session").get.fn(spark, dir)
      .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  // ---- sketch-accuracy gates for the two rows-only aggregates: the
  // sketches must land within their DECLARED error of the exact twins,
  // otherwise "no oracle by design" would hide a broken value.
  private def run(name: String) =
    GQuery.all.find(_.name == name).get.fn(spark, "/root/testdata/sf0.01")

  test("q_agg_approx_distinct: in-engine ε booleans all true; exact twin matches") {
    import spark.implicits._
    val out = run("q_agg_approx_distinct")
      .select("l_returnflag", "n_parts", "approx_ok").as[(String, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // the ε claim (|est − exact| ≤ 0.15·exact, 3σ of relativeSD 0.05) is
    // now IN the value-gated output — every row must carry true
    for ((k, _, ok) <- out) assert(ok, s"$k: sketch drifted past 3σ of the exact count")
    val exact = run("q_agg_distinct")
      .select("l_returnflag", "n_parts").as[(String, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap == exact)
  }

  test("q_agg_approx_percentile: in-engine rank-error booleans all true; exact twin matches") {
    import spark.implicits._
    // accuracy=1000 guarantees rank error ≤ n/1000; approx_ok asserts the
    // approx median lies between the exact 0.49 and 0.51 quantiles (wide
    // margin over the guarantee), evaluated in the gated output itself.
    val out = run("q_agg_approx_percentile")
      .select("l_returnflag", "exact_median", "approx_ok").as[(String, Double, Boolean)].collect()
    assert(out.nonEmpty)
    for ((k, _, ok) <- out) assert(ok, s"$k: approx median outside exact [p49, p51]")
    val twin = run("q_agg_percentile")
      .select("l_returnflag", "median_price").as[(String, Double)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap == twin)
  }

  test("q_agg_hll_merge: in-engine ε booleans all true; union of group sketches == direct sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lgConfigK=14 → relative error ~0.8%; est_ok gates at 5% per scope,
    // with the ALL row's estimate coming purely from the sketch union
    val out = run("q_agg_hll_merge")
      .select($"scope", $"exact_d", $"est_ok").as[(String, Long, Boolean)].collect()
    assert(out.map(_._1).contains("ALL") && out.length > 1)
    for ((scope, _, ok) <- out) assert(ok, s"$scope: estimate drifted past 5% of exact")
    val li = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val exactAll = li.select(countDistinct($"l_orderkey")).head.getLong(0)
    assert(out.find(_._1 == "ALL").get._2 == exactAll)
    // the mergeability contract: the union of per-group sketches answers
    // the global question without re-scanning rows. NOT register-equal to
    // a direct sketch — DataSketches unions accumulate in HLL_8 while a
    // direct sketch keeps HLL_4/sparse promotion history, so the two
    // estimates differ by well under the sketch's own error (measured
    // 14790 vs 14752 at sf0.01) — gate at 1%.
    val allEst = li.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey", 14).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("u")).head.getLong(0)
    val direct = li.agg(
      hll_sketch_estimate(hll_sketch_agg($"l_orderkey", 14)).as("d")).head.getLong(0)
    assert(math.abs(allEst - direct) <= 0.01 * direct, s"union-merged $allEst vs direct $direct")
  }

  test("q_dedup_fuzzy: a 1000-doc identical-prefix hot block stays capped") {
    import spark.implicits._
    // the skew defense: rank-by-doc_id cap (64) bounds the pair count of
    // ANY block — a boilerplate prefix shared by a million docs produces
    // at most 64·63/2 pairs, never a quadratic reducer. 1000 identical
    // docs → one block (same prefix, same token-count band) → exactly
    // the capped survivor pairs, all at distance 0.
    val tmp = java.nio.file.Files.createTempDirectory("graft_fuzzy_skew").toString
    (0 until 1000).map(i => (i.toLong, "terms of service for acme corp apply to all"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val n = GQuery.all.find(_.name == "q_dedup_fuzzy").get.fn(spark, tmp).count()
    assert(n == 64L * 63 / 2, s"hot block produced $n pairs, expected capped 2016")
  }

  test("q_dedup_substring: a planted shared paragraph is found, unique docs score zero") {
    import spark.implicits._
    // two docs share an identical paragraph embedded in otherwise
    // distinct text; a third doc is fully unique. The shared span must
    // surface as dup_frac > 0 on BOTH carriers and exactly 0 on the
    // unique doc — whole-doc hashing (q_dedup_exact) sees nothing here.
    // The two prefixes have DIFFERENT lengths that are not congruent
    // mod 8: a fixed-stride window grid would never collide on this
    // fixture — the content-defined (hash-nibble) sampling must, since
    // it picks the same span-relative offsets in both copies.
    val para = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while seventeen green turtles watch in silence from a mossy log"
    assert(para.length >= 100)
    val tmp = java.nio.file.Files.createTempDirectory("graft_substr").toString
    Seq(
      (1L, "unique preamble alpha alpha alpha " + para + " unique tail one"),
      (2L, "a wholly different opening sequence " + para + " other ending two"),
      (3L, "nothing in this document repeats anywhere else in the corpus at all"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val out = GQuery.all.find(_.name == "q_dedup_substring").get.fn(spark, tmp)
      .select($"doc_id", $"dup_frac").as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.0 && out(2L) > 0.0, s"shared paragraph missed: $out")
    assert(out(3L) == 0.0, s"unique doc flagged: $out")
  }

  test("q_sim_quantized: SQ8 top-5 tracks the exact float top-5 (recall gate)") {
    import org.apache.spark.sql.functions._
    // the quantization is lossy by design; the gate is neighborhood
    // fidelity, not score equality: mean overlap@5 between the SQ8
    // top-5 and the exact cosine top-5 (q_sim_topk, same 20 queries)
    // must hold. Measured 1.00 on this corpus at sf0.01 — a grid or
    // dot-product regression shows up as a collapse, not a flake.
    val sq = run("q_sim_quantized").select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = run("q_sim_topk").filter(col("vec_id") <= 20)
      .select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(sq.keySet == exact.keySet)
    // toSeq before mapping: Set.map would collapse equal per-query
    // recalls (all the 1.0s become ONE element) and wreck the mean
    val recall = sq.keys.toSeq.map(k => (sq(k) & exact(k)).size / 5.0).sum / sq.size
    assert(recall >= 0.8, s"mean overlap@5 $recall")
  }

  test("q_sim_rp: RP-candidate recall vs the exact-SQ8 top-5") {
    import org.apache.spark.sql.functions._
    // q_sim_rp re-ranks its RP-100 candidates with the SAME exact SQ8
    // dot q_sim_quantized ranks the whole corpus by, so overlap@5
    // against q_sim_quantized isolates exactly ONE thing: how much of
    // the true neighborhood the 32-dim ±1 projection's top-100 cut
    // retains. Measured 0.848 at sf0.01 (500-vector corpus, 21
    // queries; the dims dial: 16→0.72, 24→0.83 at the same cut). A
    // projection-matrix or reduced-dot regression shows up as a
    // collapse toward the ~100/499 random floor, not a flake — the
    // first matrix draft (an affine-mod-97 threshold whose rows are
    // translates of one sequence) measured 0.15 and died here.
    def top5(name: String) = run(name).filter(col("vec_id") <= 20)
      .select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rp = top5("q_sim_rp")
    val exact = top5("q_sim_quantized")
    assert(rp.keySet == exact.keySet)
    val recall = rp.keys.toSeq.map(k => (rp(k) & exact(k)).size / 5.0).sum / rp.size
    assert(recall >= 0.7, s"mean overlap@5 $recall")
  }

  test("q_sim_pq: PQ+refine tracks the exact top-5; re-rank depth R is a monotone dial") {
    import org.apache.spark.sql.functions._
    // PQ is doubly lossy (SQ8 grid, then 32-codeword subspace
    // quantization); the gate is the served neighborhood after the
    // exact re-rank, vs the float top-5 (q_sim_topk, same 21 queries).
    // Measured 0.895 at R=50 on this corpus — integer-deterministic,
    // so a drop is a regression, never a flake. The second gate pins
    // the serving dial: widening the ADC candidate cut must not lose
    // recall (measured 0.61 at R=10).
    val exact = run("q_sim_topk").filter(col("vec_id") <= 20)
      .select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def recallAt(candR: Int): Double = {
      val pq = graft.ops.Vectors.pqSearch(
          graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01"),
          "vec_id", "embedding", m = 16, ncw = 32,
          queryPred = col("vec_id") <= 20, candR = candR, k = 5)
        .select(col("vec_id"), col("nn_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      assert(pq.keySet == exact.keySet)
      pq.keys.toSeq.map(k => (pq(k) & exact(k)).size / 5.0).sum / pq.size
    }
    val r50 = recallAt(50)
    assert(r50 >= 0.8, s"mean overlap@5 at R=50: $r50")
    assert(recallAt(10) <= r50, "deeper re-rank cut lost recall")

    // the training dial: 2 Lloyd iterations on the subspace codebooks
    // must not lose recall vs the sampled init (measured 0.914 vs
    // 0.895 — all-integer pipeline, so a drop is a regression)
    val trained = graft.ops.Vectors.pqSearch(
        graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01"),
        "vec_id", "embedding", m = 16, ncw = 32,
        queryPred = col("vec_id") <= 20, candR = 50, k = 5, trainIters = 2)
      .select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rTrained = trained.keys.toSeq.map(k => (trained(k) & exact(k)).size / 5.0).sum / trained.size
    assert(rTrained >= r50, s"trained codebook recall $rTrained below sampled $r50")
  }

  test("q_sql_udf: the SQL UDF body is inlined — no UDF node survives into the plan") {
    val p = plan("q_sql_udf")
    // a JVM/Python UDF would appear as ScalaUDF / BatchEvalPython and
    // break codegen; the SQL UDF must analyze away into expressions
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    assert(p.contains("split"), p) // the inlined body's expression is visible
  }

  test("q_sim_binary: hamming+refine tracks the exact top-5; candR is a monotone dial") {
    import org.apache.spark.sql.functions._
    // 1-bit codes keep only direction octants, so the hamming cut is
    // the lossiest first pass in the family; the refine re-rank buys
    // fidelity back. Measured overlap@5 vs the float top-5 at sf0.01
    // (the run() fixture): 0.724 at candR=50 (0.686 at sf0.001) —
    // integer-deterministic, so a drop is a regression, never a flake.
    val exact = run("q_sim_topk").filter(col("vec_id") <= 20)
      .select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def recallAt(candR: Int): Double = {
      val b = graft.ops.Vectors.binarySearch(
          graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01"),
          "vec_id", "embedding",
          queryPred = col("vec_id") <= 20, candR = candR, k = 5)
        .select(col("vec_id"), col("nn_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      assert(b.keySet == exact.keySet)
      b.keys.toSeq.map(k => (b(k) & exact(k)).size / 5.0).sum / b.size
    }
    val r50 = recallAt(50)
    assert(r50 >= 0.6, s"mean overlap@5 at candR=50: $r50")
    assert(recallAt(10) <= r50, "wider hamming cut lost recall")
  }

  test("q_sim_ivf_pq: composed IVF∘PQ recall dials are monotone; served floor holds") {
    import org.apache.spark.sql.functions._
    // The composed serving plan adds the coarse-cut loss on top of
    // PQ's: with the untrained 9-seed quantizer (vec_id <= 8) a boundary
    // query's true neighbors can be filed in a cluster it doesn't
    // probe, and nprobe is the dial that buys them back. Measured
    // overlap@5 vs the float top-5 at sf0.01 (all-integer plan, so
    // deterministic — a drop is a regression, never a flake):
    // nprobe=1 0.552, nprobe=2 0.657, nprobe=4 0.743 at candR=50;
    // candR=10 at nprobe=4 is 0.533. Gates: the oracled config's
    // floor, both dial monotonicities, and the dialed-up floor.
    val exact = run("q_sim_topk").filter(col("vec_id") <= 20)
      .select(col("vec_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val cents = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .filter(col("vec_id") <= 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def recallAt(nprobe: Int, candR: Int): Double = {
      val r = graft.ops.Vectors.ivfPqSearch(
          graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01"),
          "vec_id", "embedding", cents, m = 16, ncw = 32,
          queryPred = col("vec_id") <= 20, nprobe = nprobe, candR = candR, k = 5)
        .select(col("vec_id"), col("nn_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      exact.keys.toSeq
        .map(k => (r.getOrElse(k, Set.empty[Long]) & exact(k)).size / 5.0)
        .sum / exact.size
    }
    val r1 = recallAt(1, 50)
    val r2 = recallAt(2, 50)
    val r4 = recallAt(4, 50)
    assert(r1 >= 0.5, s"oracled config (nprobe=1, candR=50) overlap@5: $r1")
    assert(r1 <= r2 && r2 <= r4, s"nprobe dial not monotone: $r1 / $r2 / $r4")
    assert(r4 >= 0.7, s"dialed-up (nprobe=4, candR=50) overlap@5: $r4")
    assert(recallAt(4, 10) <= r4, "deeper ADC cut lost recall")
  }

  test("q_knn_join: exact subset of brute-force threshold pairs, with bounded recall loss") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val found = run("q_knn_join")
      .select($"vec_id", $"nn_id", $"cos").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(found.nonEmpty)
    // ground truth: brute-force threshold join on the same split
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", graft.ops.Vectors.norm($"v"))
    val q = emb.filter($"vec_id" < 100)
    val c = broadcast(emb.filter($"vec_id" >= 100)
      .select($"vec_id".as("nn_id"), $"v".as("v2"), $"nrm".as("nrm2")))
    val brute = q.join(c)
      .withColumn("cos", graft.ops.Vectors.cosine($"v", $"v2", $"nrm", $"nrm2"))
      .filter($"cos" > 0.3)
      .select($"vec_id", $"nn_id", round($"cos", 4).as("cos"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // precision is exact by construction (candidates are cosine-verified)
    for ((k, cos) <- found) {
      assert(brute.contains(k), s"$k not a true threshold pair")
      assert(brute(k) == cos, s"$k: cos $cos vs brute ${brute(k)}")
    }
    // nprobe=3 multi-probe recall on this corpus (deterministic, measured
    // 202/324 = 0.62 over the untrained first-8 quantizer): the cluster
    // cut may only lose boundary pairs, never the bulk. A k-means-trained
    // quantizer raises this dial further (OpsSpec pins that effect).
    val recall = found.size.toDouble / brute.size
    assert(recall >= 0.55, s"recall $recall (${found.size}/${brute.size})")
  }

  test("q_mix_rebalance: corpus is never shuffled — dimension aggregates broadcast back") {
    val p = plan("q_mix_rebalance")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) == 1, p)
    // the only hash exchanges feed the tiny lang-count aggregate, never
    // the corpus: every hashpartitioning key must be lang-derived
    val bad = p.split("\n").filter(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("lang"))
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("q_subquery_exists: decorrelated to semi + anti hash joins, no per-row subquery") {
    val p = plan("q_subquery_exists")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q_dedup_cluster: pairs land in one cluster; cluster id is the component min") {
    import spark.implicits._
    val lab = run("q_dedup_cluster")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val pairs = run("q_dedup_ngram")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs) {
      assert(lab(a) == lab(b), s"pair ($a,$b) split across clusters ${lab(a)}/${lab(b)}")
      assert(lab(a) <= math.min(a, b), s"cluster id ${lab(a)} above member min of ($a,$b)")
    }
    // transitivity witness: the relabeled docs form clusters whose id is
    // itself a member labeled by itself (a canonical representative)
    for ((_, c) <- lab if lab.contains(c)) assert(lab(c) == c)
  }

  test("q_heavy_hitters_cms: CMS error is one-sided and the top term is exact-rank-consistent") {
    val rows = run("q_heavy_hitters_cms").collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val (nExact, est, over) = (r.getAs[Long]("n_exact"), r.getAs[Long]("est"),
        r.getAs[Long]("overcount"))
      assert(est >= nExact, s"CMS underestimated: est $est < exact $nExact (${r.mkString(",")})")
      assert(over == est - nExact)
    }
    // ranks are by EXACT counts, descending with term tie-break
    val exacts = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n_exact"))
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b })
  }

  test("q_bpe_encode: per-doc compression brackets hold and merges save strictly overall") {
    val rows = run("q_bpe_encode").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"))
      assert(c >= t && t >= w, s"bracket violated: chars $c, tokens $t, words $w")
    }
    // the 3 learned merges must compress the corpus strictly vs chars
    assert(rows.map(_.getAs[Long]("n_tokens")).sum < rows.map(_.getAs[Long]("n_chars")).sum)
  }

  for ((name, want) <- golden.toSeq.sortBy(_._1)) {
    test(s"$name returns $want rows at sf0.001") {
      assert(GQuery.all.find(_.name == name).get.fn(spark, dir).count() == want)
    }
  }
}
