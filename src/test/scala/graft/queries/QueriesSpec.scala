package graft.queries

import graft.SparkSpec

/** Regression pin: every declared query runs at sf0.001 and returns
  * exactly its golden row count (captured from an oracle-green run).
  * Catches silent semantic drift between rounds without needing DuckDB
  * in the sbt loop. The driver's DuckDB gate remains the value-level
  * check; this is the cheap structural one.
  */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val golden: Map[String, Long] = Map(
    "q_agg_approx_distinct" -> 3, "q_agg_cube" -> 12, "q_agg_distinct" -> 3,
    "q_agg_gsets" -> 124, "q_agg_hash" -> 6, "q_agg_listagg" -> 5,
    "q_agg_percentile" -> 3, "q_agg_rollup" -> 19,
    "q_array_map_funcs" -> 500, "q_case_when" -> 1500,
    "q_cdc_upsert_snapshot" -> 14, "q_cdc_incremental" -> 14, "q_cdc_mor_read" -> 14,
    "q_cdc_clustered_read" -> 14,
    "q_date_funcs" -> 1500,
    "q_dedup_cluster" -> 500, "q_dedup_embedding" -> 88, "q_dedup_exact" -> 500,
    "q_dedup_incremental" -> 11,
    "q_dedup_minhash" -> 28, "q_dedup_ngram" -> 28, "q_dedup_simhash" -> 500,
    "q_filter_pred" -> 1427, "q_fingerprint" -> 500, "q_fingerprint_rolling" -> 500,
    "q_having" -> 149, "q_set_union_all" -> 179, "q_agg_approx_percentile" -> 3,
    "q_join_anti" -> 2, "q_join_asof" -> 202, "q_join_broadcast" -> 5,
    "q_join_full" -> 900, "q_join_inner" -> 1500, "q_join_left" -> 498,
    "q_join_salted" -> 203,
    "q_join_right" -> 498, "q_join_semi" -> 148, "q_join_theta_range" -> 23,
    "q_json_funcs" -> 1000, "q_lang_id" -> 500, "q_map_funcs" -> 500, "q_math_funcs" -> 6000,
    "q_multimodal" -> 500, "q_pivot" -> 5, "q_quality_score" -> 500,
    "q_redact_pii" -> 500, "q_sample_hash" -> 98, "q_decontaminate" -> 9,
    "q_curate" -> 245, "q_repetition" -> 500,
    "q_scan_project" -> 6000, "q_set_except" -> 0, "q_set_intersect" -> 34,
    "q_set_union" -> 179, "q_sim_ivf" -> 153, "q_sim_topk" -> 255,
    "q_sort_limit" -> 100, "q_str_funcs" -> 200, "q_subquery_scalar" -> 48,
    "q_text_stats" -> 5, "q_token_count" -> 500, "q_topk" -> 449,
    "q_win_sliding" -> 1732, "q_win_session" -> 946, "q_posexplode" -> 250,
    "q_unpivot" -> 1071, "q_win_ntile" -> 124,
    "q_win_analytic" -> 1500, "q_win_percentile" -> 17,
    "q_win_range_frame" -> 1000, "q_win_rank" -> 100, "q_win_tumbling" -> 868,
    "stream_ingest_e2e" -> 172,
    "q_cdc_filegroup_upsert" -> 14, "q_cdc_changefeed" -> 15,
    "q_sample_stratified" -> 459, "q_tfidf" -> 1500, "q_pack_shards" -> 500,
    "q_dedup_containment" -> 28, "q_heavy_hitters" -> 50,
    "q_dedup_cluster_star" -> 500)

  test("every GQuery is declared in the golden map and vice versa") {
    assert(GQuery.all.map(_.name).toSet == golden.keySet)
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
    val p = plan("q_win_percentile")
    // the per-row sort must be partitioned by (priority, bucket), never
    // by the 5-value priority alone — that's the n/5 skew monster
    val rowWin = p.split("\n").find(l => l.contains("Window") && l.contains("row_number")).get
    assert(rowWin.contains("bkt"), rowWin)
    // the offsets/totals come from a count aggregate, not a raw-row window
    assert(p.contains("HashAggregate"), p)
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) == 1, p)
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

  // ---- sketch-accuracy gates for the two rows-only aggregates: the
  // sketches must land within their DECLARED error of the exact twins,
  // otherwise "no oracle by design" would hide a broken value.
  private def run(name: String) =
    GQuery.all.find(_.name == name).get.fn(spark, "/root/testdata/sf0.01")

  test("q_agg_approx_distinct within HLL++ error of the exact twin") {
    import spark.implicits._
    val approx = run("q_agg_approx_distinct")
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = run("q_agg_distinct")
      .select("l_returnflag", "n_parts").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      // default relativeSD = 0.05; allow 3 sigma
      assert(math.abs(approx(k) - e) <= 0.15 * e, s"$k: approx ${approx(k)} vs exact $e")
    }
  }

  test("q_agg_approx_percentile within declared rank error of the exact quantiles") {
    import spark.implicits._
    // accuracy=1000 guarantees rank error ≤ n/1000; the approx median
    // must therefore lie between the exact 0.49 and 0.51 quantiles
    // (wide margin over the guarantee).
    val approx = run("q_agg_approx_percentile")
      .select("l_returnflag", "approx_median").as[(String, Double)].collect().toMap
    val bounds = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.expr(
        "percentile(l_extendedprice, array(0.49, 0.51))").as("b"))
      .select($"l_returnflag", $"b".getItem(0).as("lo"), $"b".getItem(1).as("hi"))
      .as[(String, Double, Double)].collect()
    assert(bounds.nonEmpty)
    for ((k, lo, hi) <- bounds) {
      val a = approx(k)
      assert(a >= lo && a <= hi, s"$k: approx median $a outside exact [$lo, $hi]")
    }
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

  for ((name, want) <- golden.toSeq.sortBy(_._1)) {
    test(s"$name returns $want rows at sf0.001") {
      assert(GQuery.all.find(_.name == name).get.fn(spark, dir).count() == want)
    }
  }
}
