// Scale-probe: time key pipeline queries at sf0.1 and at a 10x-scaled
// corpus, print the wall-clock ratios. Evidence for SCALE.md's
// linear-scaling claims. Run: spark-shell -I scripts/scale_probe.scala
//
// The 10x corpus is NOT 10 verbatim copies — that would multiply every
// near-dup cluster by 10 and grow pair output ~100x (a different, dup-
// heavy regime). Each copy i prefixes every token with "c<i>" so copies
// share no shingles: dup structure per copy is preserved, totals scale
// linearly, and the timing ratio measures the ALGORITHM's scaling.
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.queries.GQuery

val base = "/root/testdata/sf0.1"
// v2: rebuilt after the round-13 events-decode fix — v1 dirs carry a
// BIGINT ts column the canonical loader would mis-scale
val scaled = "/tmp/graft_scale10_v2"
val K = 10

if (!Files.exists(Paths.get(scaled, "_DONE"))) {
  val docs = spark.read.parquet(s"$base/documents.parquet")
  val maxDoc = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
  val copies = (0 until K).map { i =>
    docs.select(
      (col("doc_id") + lit(i.toLong * maxDoc)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(lit(s"c$i"), t))).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }
  copies.reduce(_.unionByName(_)).repartition(32)
    .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
  // read events through the canonical loader (it normalizes whatever
  // encoding the driver generated — TIMESTAMP since round 12, raw
  // nanos before; see FIXTURES.md "events.ts encoding history"): the
  // scaled copy then stores plain TIMESTAMP, which Tables.events reads
  // natively. Round 13: the previous raw-BIGINT re-read here silently
  // re-introduced the 1000x unit bug against micros fixtures.
  val ev = graft.tables.Tables.events(spark, base)
  val maxUser = ev.agg(max("user_id")).collect()(0).getLong(0) + 1
  val maxEv = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
  val evCopies = (0 until K).map { i =>
    ev.select((col("event_id") + lit(i.toLong * maxEv)).as("event_id"),
      col("ts"), (col("user_id") + lit(i.toLong * maxUser)).as("user_id"),
      col("event_type"), col("value"), col("props"))
  }
  evCopies.reduce(_.unionByName(_)).repartition(32)
    .write.mode("overwrite").parquet(s"$scaled/events.parquet")
  // 10x facts with consistent join keys: order keys offset per copy,
  // customer keys unchanged (same dim, 10x orders per customer)
  val li = spark.read.parquet(s"$base/lineitem.parquet")
  val ord = spark.read.parquet(s"$base/orders.parquet")
  val maxOrd = ord.agg(max("o_orderkey")).collect()(0).getLong(0) + 1
  (0 until K).map { i =>
    li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * maxOrd))
  }.reduce(_.unionByName(_)).repartition(32)
    .write.mode("overwrite").parquet(s"$scaled/lineitem.parquet")
  (0 until K).map { i =>
    ord.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * maxOrd))
  }.reduce(_.unionByName(_)).repartition(32)
    .write.mode("overwrite").parquet(s"$scaled/orders.parquet")
  // 10x embeddings for the ANN probes: id-offset copies with a small
  // per-copy perturbation on every dimension so copies are not exact
  // duplicates (timing measures the scan/cut machinery either way,
  // but degenerate all-equal neighbors would distort the window cuts)
  val emb = spark.read.parquet(s"$base/embeddings.parquet")
  val maxVec = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
  (0 until K).map { i =>
    emb.select((col("vec_id") + lit(i.toLong * maxVec)).as("vec_id"),
      transform(col("embedding"), x => (x + lit(i * 0.013f)).cast("float")).as("embedding"),
      col("label"))
  }.reduce(_.unionByName(_)).repartition(32)
    .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
  // small dims copied as-is
  for (t <- Seq("customer", "nation", "region", "supplier", "part"))
    Files.copy(Paths.get(s"$base/$t.parquet"), Paths.get(s"$scaled/$t.parquet"))
  Files.createFile(Paths.get(scaled, "_DONE"))
  println("scaled corpus written")
}

val queries = Seq("q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram",
  "q_dedup_substring", "q_lm_score", "q_text_search", "q_graph_pagerank",
  "q_tfidf", "q_chunk_docs", "q_token_count", "q_win_session", "q_funnel",
  "q_agg_hash", "q_agg_mode", "q_tpch_q3", "q_tpch_q10", "q_win_analytic",
  // round 13: the new TPC-H shapes with fact-side work + both PQ plans
  "q_tpch_q2", "q_tpch_q16", "q_tpch_q21", "q_sim_pq", "q_sim_ivf_pq",
  // round 13 family completion: Q8 (widest join tree), Q9 (LIKE-pruned
  // 5-way profit), Q20 (doubly nested IN over the one-pass bridge)
  "q_tpch_q8", "q_tpch_q9", "q_tpch_q20",
  // round 13 additions: tokenizer training (corpus pass + vocab-sized
  // iterations), CMS sketch build, robust outlier stats
  "q_bpe_train", "q_heavy_hitters_cms", "q_quality_outliers",
  // round 14 additions: the JL-projection ANN serving plan, the
  // Gram-pass PCA, per-column profiling, the mergeable quantile sketch
  "q_sim_rp", "q_embed_pca", "q_profile_stats", "q_quantile_sketch",
  // round 14 late additions: incremental CC vs its full-recompute
  // sibling (the maintenance-vs-recompute gap is the claim), the
  // one-exchange pattern matcher, the one-pass pairwise statistic,
  // and the grid-sized anomaly pass
  "q_dedup_cluster", "q_dedup_cluster_incr", "q_event_pattern",
  "q_stats_corr", "q_ts_anomaly",
  // round 14 third-session wide shapes: both hybrid-retrieval legs +
  // fusion, frontier BFS (iterative joins), the typed top-k aggregate
  // vs its window sibling, the Expand multi-distinct, the grid EWMA
  "q_hybrid_rrf", "q_graph_bfs", "q_agg_topk_typed",
  "q_agg_multi_distinct", "q_ts_ewma",
  // round 14 batch-4/5 wide shapes: matryoshka two-stage ANN, sketch
  // inclusion-exclusion, the QI-window release, weighted percentile
  "q_sim_mrl", "q_agg_hll_intersect", "q_privacy_kanon",
  "q_agg_weighted_percentile",
  // round 14 batch-6/7 corpus-pass shapes: the distinct-window
  // rewrite, array-adjacent bigram statistics, vocabulary-graph rank
  "q_win_running_distinct", "q_text_collocations", "q_text_keywords",
  // round 14 closers: the RAG serving composite (fusion + packing)
  "q_pipeline_rag",
  // round 15: the re-planned exact-ANN baseline (corpus streamed,
  // queries broadcast) and z-order gate (two-level rank), the served
  // BM25 delta-union read, the FK anti-join constraint pass, and the
  // two post-close round-14 shapes never probed
  "q_sim_topk", "q_layout_zorder", "q_text_search_served",
  "q_quality_constraints", "q_privacy_ldiv", "q_hll_intersect_served",
  // round 16: the last wide shapes with no probe row — the partial-
  // update key exchange and the boilerplate segment-key shuffle
  // (q_bpe_train already probes above)
  "q_cdc_partial_update", "q_boilerplate",
  // round 18: the change-feed TVF (full-outer version diff — the one
  // genuinely table-scaling new shape) and the ALTER lifecycle (CTAS
  // write + metadata widen + half-key UPDATE backfill)
  "q_cdc_sql_changefeed", "q_cdc_sql_alter",
  // round 18 closer: the cleaner lifecycle (CTAS write + two UPDATE
  // commits + the metadata-only clean + procedure listings) — the
  // clean itself is manifest metadata; probed because the body
  // composes a write-heavy lifecycle, same rationale as the ALTER row
  "q_cdc_sql_clean",
  // round 19: the startingVersion incremental read — head scan cut to
  // changed file groups + an ord-threshold filter with a 1-row
  // subquery over version v's files
  "q_cdc_read_incremental")

// Optional filter for targeted runs (same convention as
// SPARK_GRAFT_VERIFY_ONLY): probe only the named queries.
val probeOnly = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
val probeList = queries.filter(q => probeOnly.forall(_.contains(q)))

def time(name: String, dir: String): Double = {
  val fn = GQuery.all.find(_.name == name).get.fn
  // noop sink, NOT .count(): count() lets Catalyst prune aggregate
  // expressions and eliminate top-level sorts (a multi-distinct agg
  // measured 0.2 s under count() vs 6.3 s executed), so it under-times
  // exactly the work the probe exists to measure. The noop write runs
  // the full physical plan and discards rows.
  // min of 3 to shed one-off JIT/GC stalls
  (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }.min
}

println(f"${"query"}%-16s ${"sf0.1(s)"}%9s ${"10x(s)"}%9s ${"ratio"}%6s")
for (q <- probeList) {
  val t1 = time(q, base)
  val t10 = time(q, scaled)
  println(f"$q%-16s $t1%9.2f $t10%9.2f ${t10 / t1}%6.1f")
}
System.exit(0)
