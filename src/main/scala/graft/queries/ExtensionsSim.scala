package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcGen, CdcMerge, Ingest}
import graft.ops.{Bpe, IvfIndex, IvfPqIndex, LshIndex, Text, Vectors}
import graft.tables.Tables

/** Similarity / ANN family: the compression-rung ladder (SQ8/PQ/binary/MRL/
  * RP/PCA), IVF and composed serving paths, kNN join, retrieval eval.
  *
  * One family file of the [[Extensions]] registry (split round 18 —
  * the single 6k-line file had become the review bottleneck). Blocks
  * are verbatim moves; shared fixtures/oracle helpers live in
  * [[QFixtures]]. Every query keeps its DuckDB oracle and scale note.
  */
private[queries] object ExtensionsSim {

  import QFixtures._

  def queries: Seq[GQuery] = Seq(

    // SEMANTIC dedup (the SemDeDup shape, Abbas et al. 2023): partition
    // the embedding space with the coarse quantizer (narrow
    // centroid-literal assignment — zero shuffles), generate cosine
    // near-dup pairs ONLY within clusters (ONE shuffle on the cluster
    // key — the all-pairs cut that makes semantic dedup feasible at
    // corpus scale; sf0.1 measured: in-cluster pairs ≈ corpus²/k), then
    // connected components → every vector labeled with its semantic
    // group representative (component min — the copy a curation pass
    // keeps). Centroids here are the deterministic first-8 init so the
    // full pipeline is oracle-replayable bit-for-bit; the PRODUCTION
    // path is Vectors.semanticGroups(emb, id, vec, thr, k =
    // Vectors.semanticK(n), iters = 3) — same plan shape with a
    // k-means-TRAINED quantizer and k scaled ∝ n, which is what keeps
    // the in-cluster pair bound ≈ n·target/2 linear at corpus scale
    // (OpsSpec gates that training reduces candidate pairs; SCALE.md
    // tabulates pair count vs k).
    // MATRYOSHKA two-stage ANN (MRL, Kusupati et al. NeurIPS'22 — the
    // prefix-dimension serving pattern modern embedding models train
    // for): stage 1 ranks on the FIRST 8 of 64 dims (an 8× cheaper
    // scan — with MRL training the prefix is itself a valid coarse
    // embedding), stage 2 re-ranks only the top-100 survivors on the
    // full vector. Same scale discipline as the PQ/RP rerank family:
    // the query batch broadcasts, the corpus streams its PREFIX slices
    // once (the full 64-dim column never rides the candidate shuffle),
    // the per-query top-100 cut is the row_number-filter shape Spark
    // executes as WindowGroupLimit (map-side partials before the one
    // exchange), and only survivors fetch full vectors by join.
    GQuery(
      "q_sim_mrl",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
        val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), slice(col("embedding"), 1, 8).as("qp"),
            col("embedding").as("qv"))
        val pref = emb.select(col("vec_id"), slice(col("v"), 1, 8).as("p"))
          .withColumn("pn", Vectors.norm(col("p")))
        val wC = Window.partitionBy(col("q_id")).orderBy(col("ps").desc, col("vec_id"))
        val cand = pref
          .join(broadcast(queries.select(col("q_id"), col("qp"))
            .withColumn("qpn", Vectors.norm(col("qp")))), col("vec_id") =!= col("q_id"))
          .withColumn("ps", Vectors.cosine(col("p"), col("qp"), col("pn"), col("qpn")))
          .withColumn("rn", row_number().over(wC)).filter(col("rn") <= 100)
          .select(col("q_id"), col("vec_id"))
        val wF = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        cand.join(emb.withColumn("nrm", Vectors.norm(col("v"))), "vec_id")
          .join(broadcast(queries.select(col("q_id"), col("qv"))
            .withColumn("qn", Vectors.norm(col("qv")))), "q_id")
          .withColumn("cos", Vectors.cosine(col("v"), col("qv"), col("nrm"), col("qn")))
          .withColumn("rk", row_number().over(wF)).filter(col("rk") <= 5)
          .select(col("q_id"), col("rk").cast("int").as("rk"),
            col("vec_id").as("nn_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("q_id"), col("rk"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |p AS (SELECT vec_id, e[1:8] AS pe FROM v),
             |q AS (SELECT vec_id AS q_id, pe AS qp FROM p WHERE vec_id < 8),
             |qf AS (SELECT vec_id AS q_id, e AS qv FROM v WHERE vec_id < 8),
             |cand AS (SELECT q_id, vec_id FROM (
             |  SELECT q.q_id, p.vec_id,
             |    row_number() OVER (PARTITION BY q.q_id
             |      ORDER BY list_cosine_similarity(p.pe, q.qp) DESC, p.vec_id) AS rn
             |  FROM p JOIN q ON p.vec_id <> q.q_id) z WHERE rn <= 100)
             |SELECT q_id, rk::INT AS rk, vec_id AS nn_id, round(c, 4) AS cos FROM (
             |  SELECT c2.q_id, c2.vec_id, list_cosine_similarity(v.e, qf.qv) AS c,
             |    row_number() OVER (PARTITION BY c2.q_id
             |      ORDER BY list_cosine_similarity(v.e, qf.qv) DESC, c2.vec_id) AS rk
             |  FROM cand c2 JOIN v USING (vec_id) JOIN qf USING (q_id)) w
             |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin)),

    // VECTOR-MATH function surface — the declarative (functions-not-
    // UDFs) vector ops every embedding pipeline composes: dot, L2/L1/
    // L∞ norms, dimensionality, and a normalized component — all
    // higher-order-function expressions (zip_with/aggregate/transform/
    // array_max) plus the FloatDot codegen kernel, no UDF anywhere;
    // narrow per-row work, one scan, nothing shuffled before the
    // presentation sort. L∞ via array_max is deliberately
    // order-independent; the sequential-fold sums match DuckDB's
    // list kernels (the q_sim_topk-proven pairing).
    GQuery(
      "q_vector_funcs",
      (s, dir) => {
        val v = col("embedding")
        Tables.embeddings(s, dir).filter(col("vec_id") < 100)
          .select(col("vec_id"),
            size(v).as("dim"),
            round(Vectors.dot(v, v), 4).as("dot_self"),
            round(Vectors.norm(v), 4).as("l2"),
            round(expr("aggregate(embedding, 0D, (a, x) -> a + abs(CAST(x AS DOUBLE)))"), 4).as("l1"),
            round(expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"), 4).as("linf"),
            round(v.getItem(0).cast("double") / Vectors.norm(v), 4).as("u0"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 100)
             |SELECT vec_id, len(e)::INT AS dim,
             |  round(list_dot_product(e, e), 4) AS dot_self,
             |  round(sqrt(list_dot_product(e, e)), 4) AS l2,
             |  round(list_reduce(list_transform(e, x -> abs(x)), (a, x) -> a + x), 4) AS l1,
             |  round(list_max(list_transform(e, x -> abs(x))), 4) AS linf,
             |  round(e[1] / sqrt(list_dot_product(e, e)), 4) AS u0
             |FROM v ORDER BY vec_id""".stripMargin)),

    // ------------------------------------------------ similarity search
    // Brute-force exact cosine top-k for a bounded query set (vec_id ≤
    // 50) against the full corpus — the correctness baseline. Sides
    // matter at scale: the ≤51 QUERY rows are broadcast and the CORPUS
    // is streamed (the discipline every later similarity query follows,
    // e.g. q_sim_mrl) — the original inverted form broadcast the corpus,
    // a multi-GB ship to every task at 100× data. Per-query top-5 via
    // row_number ≤ 5, which Spark plans as WindowGroupLimit: each
    // corpus partition keeps only its local top-5 per query before the
    // single query-key exchange, so the shuffle carries ≤ 5·|queries|
    // rows per partition regardless of corpus size. Scale path beyond
    // exact: the IVF/PQ ladder below; the oracle stays on this exact
    // form (SURVEY.md §7.5).
    GQuery(
      "q_sim_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").as("v"))
        val corpus = fanout(emb)
          .select(col("vec_id").as("nn_id"), col("v").as("v2"))
          .withColumn("nrm2", Vectors.norm(col("v2")))
        val queries = emb.filter(col("vec_id") <= 50)
          .withColumn("nrm", Vectors.norm(col("v")))
        val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
        corpus.join(broadcast(queries), col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, round(c, 4) AS cos FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    list_cosine_similarity(a.e, b.e) AS c,
             |    row_number() OVER (PARTITION BY a.vec_id
             |      ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rn
             |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
             |  WHERE a.vec_id <= 50) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // IVF-style ANN — the declared scale path for similarity search:
    // assign every vector to its nearest centroid, then search only
    // within the query's own cluster (nprobe=1). The centroids are
    // INDEX METADATA (k vectors, driver-sized even at k=thousands — the
    // same bounded-collect rule as IvfIndex's probed-cluster list), so
    // the assignment is a NARROW per-row argmax over centroid literals:
    // greatest() over (cosine, -c_id) structs, FloatDot inside
    // whole-stage codegen, zero joins and zero shuffles. The only wide
    // exchange left is the real one — co-partitioning by cluster key
    // for the in-cluster top-k. (Previously a join + row_number window
    // partitioned by vec_id: a full-corpus shuffle that existed only to
    // pick a per-row maximum.) At real scale centroids come from
    // k-means and nprobe grows — the plan shape (narrow assign →
    // co-partition by cluster → in-cluster top-k) is exactly this one.
    GQuery(
      "q_sim_ivf",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
        // driver-side norm replays FloatDot's fold exactly (sequential
        // left-to-right sum of float→double products), so the literal
        // path is bit-identical to the previous join's column math
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val cv = r.getSeq[Float](1)
            val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
            (r.getLong(0), cv, cnrm)
          }.sortBy(_._1).toSeq
        // argmax by (cosine desc, c_id asc): struct compares cosine
        // first; the negated id makes greatest() break ties to the
        // LOWEST centroid id, matching the window's ORDER BY
        val scored = cents.map { case (cid, cv, cnrm) =>
          struct(
            (Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("c"),
            lit(-cid).as("nid"))
        }
        val assigned = emb
          .withColumn("cluster", -greatest(scored: _*).getField("nid"))
          .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
        val queries = assigned.filter(col("vec_id") <= 50)
          .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
        val corpus = assigned.select(col("vec_id").as("nn_id"),
          col("v").as("v2"), col("nrm").as("nrm2"), col("cluster"))
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
        queries.join(corpus, Seq("cluster"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, round(cc, 4) AS cos FROM (
             |  SELECT q.vec_id, x.vec_id AS nn_id,
             |    list_cosine_similarity(q.e, x.e) AS cc,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |  FROM assigned q JOIN assigned x
             |    ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |  WHERE q.vec_id <= 50) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin)),

    // RETRIEVAL EVALUATION as a first-class op — the measurement pass
    // every ANN deployment runs (and what QueriesSpec's recall gates do
    // in test code, promoted to the oracled surface): the 1-probe IVF
    // serve evaluated per query against the exact brute-force top-5.
    // Output is ALL-INTEGER (n_served, hits = |served ∩ exact@5|,
    // first_rank = the served rank of the exact NEAREST neighbor, 0 if
    // the cluster cut lost it), so recall@5 / MRR aggregate downstream
    // without any float leaving the engine. Both sides reuse the exact
    // cosine machinery the hash gate already pins (q_sim_topk /
    // q_sim_ivf), so the eval itself replays bit-exactly. Scale: the
    // exact side is the expensive leg (corpus broadcast per query — the
    // eval set is small by design, this is an OFFLINE measurement op);
    // the serve side is the one-cluster-key exchange.
    GQuery(
      "q_ann_eval",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val cv = r.getSeq[Float](1)
            val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
            (r.getLong(0), cv, cnrm)
          }.sortBy(_._1).toSeq
        val scored = cents.map { case (cid, cv, cnrm) =>
          struct(
            (Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("c"),
            lit(-cid).as("nid"))
        }
        // cache: one assignment pass feeds the serve leg, the exact leg,
        // and the query slice (the q_text_search multi-consumer rule)
        val assigned = emb
          .withColumn("cluster", -greatest(scored: _*).getField("nid"))
          .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
          .localCheckpoint()
        val queries = assigned.filter(col("vec_id") <= 50)
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
        // served: 1-probe IVF top-5 (the q_sim_ivf plan at k=5)
        val served = queries
          .join(assigned.select(col("vec_id").as("nn_id"), col("v").as("v2"),
            col("nrm").as("nrm2"), col("cluster")), Seq("cluster"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"))
        // exact: brute-force top-5 over the full corpus (q_sim_topk plan)
        val exact = queries
          .join(broadcast(emb.select(col("vec_id").as("nn_id"), col("v").as("v2"),
            col("nrm").as("nrm2"))), col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"))
        val base = served.groupBy(col("vec_id")).agg(count(lit(1)).as("n_served"))
        val hits = served
          .join(exact.select(col("vec_id"), col("nn_id")), Seq("vec_id", "nn_id"))
          .groupBy(col("vec_id")).agg(count(lit(1)).as("hits"))
        val fr = served
          .join(exact.filter(col("rn") === 1).select(col("vec_id"), col("nn_id")),
            Seq("vec_id", "nn_id"))
          .groupBy(col("vec_id")).agg(min(col("rn")).as("first_rank"))
        base
          .join(hits, Seq("vec_id"), "left")
          .join(fr, Seq("vec_id"), "left")
          .select(col("vec_id"), col("n_served").cast("long").as("n_served"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            coalesce(col("first_rank"), lit(0)).cast("int").as("first_rank"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |served AS (
             |  SELECT vec_id, rn, nn_id FROM (
             |    SELECT q.vec_id, x.vec_id AS nn_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |    FROM assigned q JOIN assigned x
             |      ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |    WHERE q.vec_id <= 50) t WHERE rn <= 5),
             |exact AS (
             |  SELECT vec_id, rn, nn_id FROM (
             |    SELECT q.vec_id, x.vec_id AS nn_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |    FROM assigned q JOIN v x ON q.vec_id <> x.vec_id
             |    WHERE q.vec_id <= 50) t WHERE rn <= 5),
             |base AS (SELECT vec_id, count(*)::BIGINT AS n_served FROM served GROUP BY vec_id),
             |hits AS (SELECT s.vec_id, count(*)::BIGINT AS hits
             |         FROM served s JOIN exact e ON s.vec_id = e.vec_id AND s.nn_id = e.nn_id
             |         GROUP BY s.vec_id),
             |fr AS (SELECT s.vec_id, min(s.rn) AS first_rank
             |       FROM served s JOIN exact e ON s.vec_id = e.vec_id AND s.nn_id = e.nn_id
             |       WHERE e.rn = 1 GROUP BY s.vec_id)
             |SELECT b.vec_id, b.n_served,
             |  coalesce(h.hits, 0)::BIGINT AS hits,
             |  coalesce(f.first_rank, 0)::INT AS first_rank
             |FROM base b LEFT JOIN hits h ON b.vec_id = h.vec_id
             |LEFT JOIN fr f ON b.vec_id = f.vec_id
             |ORDER BY b.vec_id""".stripMargin)),

    // The SAME ANN search served from the PERSISTED IVF index
    // (ops/IvfIndex): built once per sf (cached fixture — train at
    // iters=0 so the centroids are the deterministic first-8 init and
    // the oracle can replay them; a trained quantizer's float means are
    // not portably replayable), then every invocation reads centroids +
    // only the probed cluster partitions from the committed layout.
    // What verify value-checks here is the full build/serve split —
    // parquet round-trip, partition pruning, delta-union read path —
    // against the identical DuckDB semantics as q_sim_ivf (centroids
    // vec_id < 8 = the first-8-ids init).
    GQuery(
      "q_sim_ivf_served",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val idxDir = cachedFixture(s"graft_ivfq_cache_v1_$sfKey") { root =>
          IvfIndex.build(s, root + "/idx", fanout(Tables.embeddings(s, dir)),
            "vec_id", "embedding", k = 8, iters = 0)
        } + "/idx"
        IvfIndex.topK(s, idxDir, Tables.embeddings(s, dir).filter(col("vec_id") <= 50),
            "vec_id", "embedding", k = 3, nprobe = 1)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |assigned AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c) z WHERE rn = 1)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, round(cc, 4) AS cos FROM (
             |  SELECT q.vec_id, x.vec_id AS nn_id,
             |    list_cosine_similarity(q.e, x.e) AS cc,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.e, x.e) DESC, x.vec_id) AS rn
             |  FROM assigned q JOIN assigned x
             |    ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |  WHERE q.vec_id <= 50) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin)),

    // Cross-corpus ANN JOIN — the embedding-decontamination shape: every
    // held-out "eval" vector (vec_id < 100) against the disjoint "train"
    // corpus (vec_id >= 100), reporting ALL train neighbors above a
    // cosine threshold (threshold semantics, not top-k: contamination
    // wants every hit, and a plain similarity join is what record
    // linkage / semantic retrieval-vs-corpus audits run). Both sides go
    // through the NARROW centroid-literal assignment; the corpus lives
    // in its 1 nearest cluster while each query MULTI-PROBES its 3
    // nearest (the recall dial at a cluster boundary — a corpus vector
    // filed on the other side of the boundary is still found; nprobe=3
    // over the untrained first-8 quantizer measures ~0.6 recall at
    // sf0.01 vs 0.48 at nprobe=2, gated in QueriesSpec). The only
    // wide exchange is the cluster-key co-partition join; in-cluster
    // work is pairs-within-cluster, never |eval|×|train|. A (q, nn)
    // pair can appear at most once — the corpus side owns exactly one
    // cluster — so no distinct is needed.
    GQuery(
      "q_knn_join",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        Vectors.annJoin(emb.filter(col("vec_id") < 100),
            fanout(emb.filter(col("vec_id") >= 100)),
            "vec_id", "embedding", cents, nprobe = 3, threshold = 0.3)
          .orderBy(col("vec_id"), col("nn_id"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |corpus AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c WHERE a.vec_id >= 100) z WHERE rn = 1),
             |queries AS (
             |  SELECT vec_id, e, c_id AS cluster FROM (
             |    SELECT a.vec_id, a.e, c.c_id,
             |      row_number() OVER (PARTITION BY a.vec_id
             |        ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |    FROM v a CROSS JOIN cent c WHERE a.vec_id < 100) z WHERE rn <= 3)
             |SELECT q.vec_id, x.vec_id AS nn_id,
             |  round(list_cosine_similarity(q.e, x.e), 4) AS cos
             |FROM queries q JOIN corpus x ON q.cluster = x.cluster
             |WHERE list_cosine_similarity(q.e, x.e) > 0.3
             |ORDER BY q.vec_id, nn_id""".stripMargin)),

    // HYBRID RETRIEVAL by RECIPROCAL RANK FUSION (Cormack et al.
    // SIGIR'09 — the standard fusion rule production search runs over
    // its lexical and vector legs): the BM25 top-50 (q_text_search's
    // exact pipeline) and the cosine top-50 for a query vector fuse by
    // rrf = Σ 1/(60 + rank), a rank-only formula deliberately immune to
    // the two legs' incomparable score scales. Both legs keep their own
    // scale discipline (corpus never broadcast on the vector leg —
    // query rides as the broadcast literal; global top-50 cuts are
    // map-side TakeOrdered partials); the fusion join then touches 50+50
    // ROWS, not the corpus — fusion cost is rank-list-sized at any
    // corpus scale. Ranks are ints, 1/(60+r) is one IEEE division each,
    // the two-term sum is fixed-order, floor-scaled at 1e-6 — exact
    // across engines; a doc missing from a leg contributes 0 (the
    // standard RRF convention), exercised through the full-outer join.
    GQuery(
      "q_hybrid_rrf",
      (s, dir) => rrfFusedTop10(s, dir),
      Some("""WITH toks AS (
             |  SELECT doc_id, t AS term FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
             |  WHERE t IS NOT NULL AND t <> ''),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
             |stats AS (SELECT count(*) AS t_total, count(DISTINCT doc_id) AS n_docs FROM toks),
             |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
             |qterms AS (SELECT term, df FROM dft ORDER BY df DESC, term LIMIT 3),
             |tf AS (SELECT doc_id, term, df, count(*) AS tf FROM toks
             |       JOIN qterms USING (term) GROUP BY doc_id, term, df),
             |sc AS (SELECT t.doc_id,
             |         (n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)
             |           * (tf * 2.2::DOUBLE)
             |           / (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl
             |              / (t_total::DOUBLE / n_docs))) AS sc
             |       FROM tf t JOIN dl d USING (doc_id) CROSS JOIN stats),
             |bm AS (SELECT doc_id,
             |         floor(list_reduce(list_sort(list(sc)), (a, x) -> a + x) * 10000 + 0.5) / 10000 AS bm25
             |       FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
             |tr AS (SELECT doc_id, (row_number() OVER (ORDER BY bm25 DESC, doc_id))::INT AS r_t FROM bm),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
             |vs AS (SELECT vec_id, list_cosine_similarity(v.e, q.qe) AS c
             |       FROM v CROSS JOIN q ORDER BY c DESC, vec_id LIMIT 50),
             |vr AS (SELECT vec_id AS doc_id, (row_number() OVER (ORDER BY c DESC, vec_id))::INT AS r_v FROM vs)
             |SELECT doc_id, r_t, r_v,
             |  floor((coalesce(1::DOUBLE / (r_t + 60), 0) + coalesce(1::DOUBLE / (r_v + 60), 0))
             |        * 1000000 + 0.5) / 1000000 AS rrf
             |FROM tr FULL OUTER JOIN vr USING (doc_id)
             |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // --------------------------------------- quantized similarity (SQ8)
    // Int8 scalar-quantized ANN — the memory-bandwidth scale path for
    // similarity serving: embeddings are squashed to one byte per
    // dimension and top-k runs on exact INTEGER dot products of the
    // codes. At
    // 100 TB the win is the working set: a 64-dim corpus drops from
    // 256 B to 64 B per vector, so 4x more index fits in executor
    // page cache and the brute scan is 4x less bandwidth-bound; the
    // integer dot also sidesteps float-summation order entirely — the
    // scores are bit-identical across engines and partitionings, which
    // is why this variant carries a full value oracle where the float
    // paths need round(…, 4). The grid is SYMMETRIC on the unit sphere:
    // vectors are L2-normalized, then code = floor(vn * 127) in
    // [-127, 127] -- centered on zero, so the integer code dot is a
    // rank-faithful surrogate for cosine. (An offset grid like
    // floor((x - min) * s) is NOT: the additive offset term dominates
    // the ranking, which the QueriesSpec recall gate catches as
    // overlap@5 = 0.) Normalization + quantization are a narrow
    // per-row map with no corpus statistics at all (no collect, no
    // extra pass); the norm is an explicit LEFT FOLD on both sides
    // (aggregate with 0D seed / list_reduce) so both engines add in
    // the same order -- bit-equal doubles in, bit-equal codes out.
    // Top-k is the same broadcast-corpus + per-query window as
    // q_sim_topk (at real scale: IVF cluster co-partition first, SQ8
    // codes inside each cluster, byte-packed binary column).
    // Quantized-vs-exact recall (overlap@5 vs q_sim_topk) is gated in
    // QueriesSpec.
    GQuery(
      "q_sim_quantized",
      (s, dir) => {
        // Vectors.norm (codegen'd FloatDot) folds the same left-to-right
        // float→double products as the composed aggregate — bit-equal
        // norms, so the grid codes and the oracle are unchanged
        val q = Tables.embeddings(s, dir)
          .withColumn("nrm", Vectors.norm(col("embedding")))
          .select(col("vec_id"),
            Vectors.sq8(col("embedding"), col("nrm")).as("q"))
        val corpus = broadcast(q.select(col("vec_id").as("nn_id"), col("q").as("q2")))
        val w = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
        fanout(q.filter(col("vec_id") <= 20))
          .join(corpus, col("vec_id") =!= col("nn_id"))
          .withColumn("score", Vectors.longDot(col("q"), col("q2")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0) AS BIGINT)) AS q
             |  FROM (SELECT vec_id, embedding,
             |          sqrt(list_reduce(list_transform(embedding, y -> CAST(y AS DOUBLE) * y),
             |                           (a, y) -> a + y)) AS nrm
             |        FROM embeddings) t),
             |s AS (
             |  SELECT a.vec_id, c.vec_id AS nn_id,
             |    list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * c.q[i]))::BIGINT AS score
             |  FROM qv a JOIN qv c ON a.vec_id <> c.vec_id
             |  WHERE a.vec_id <= 20)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM s) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // RANDOM-PROJECTION ANN (Johnson–Lindenstrauss) — the remaining
    // member of the embedding-compression family (SQ8 grid, PQ
    // codebooks, 1-bit hamming, PCA): a deterministic md5-derived ±1
    // projection (Vectors.rpMatrix — per-cell hashing keeps the rows
    // independent, which IS the JL guarantee; see the matrix scaladoc
    // for the measured failure of cheap arithmetic rules) folds the
    // 64-dim SQ8 codes to 32 exact-integer coordinates via one
    // codegen'd LongDot per output dim (narrow, no shuffle).
    // Candidate generation streams the REDUCED corpus (32 longs/vec —
    // half the SQ8 scan bandwidth, the JL memory-bandwidth dividend)
    // against the BROADCAST query batch — the corpus is never
    // broadcast (the q_sim_pq lesson), and the per-query top-100 cut
    // is WindowGroupLimit-partial: each partition forwards ≤
    // 100·|queries| rows, so the one exchange is survivor-sized, not
    // corpus-sized. Survivors alone (broadcast as keys) fetch full
    // codes for the exact integer re-rank. Fully deterministic
    // pipeline → full value oracle, approximation and all; the
    // recall dial (dims 16→0.72, 32→0.85 overlap@5 at cut 100,
    // sf0.01) is gated in QueriesSpec.
    GQuery(
      "q_sim_rp",
      (s, dir) => {
        val mat = Vectors.rpMatrix(32, 64)
        val q = Tables.embeddings(s, dir)
          .withColumn("nrm", Vectors.norm(col("embedding")))
          .select(col("vec_id"), Vectors.sq8(col("embedding"), col("nrm")).as("qc"))
        val rp = q.select(col("vec_id"), Vectors.rpProject(col("qc"), mat).as("p"))
        val rpQueries = broadcast(rp.filter(col("vec_id") <= 20))
        val wRp = Window.partitionBy(col("vec_id")).orderBy(col("rp_score").desc, col("nn_id"))
        val surv = fanout(rp.select(col("vec_id").as("nn_id"), col("p").as("p2")))
          .join(rpQueries, col("vec_id") =!= col("nn_id"))
          .withColumn("rp_score", Vectors.longDot(col("p"), col("p2")))
          .withColumn("rn_c", row_number().over(wRp))
          .filter(col("rn_c") <= 100)
          .select(col("vec_id"), col("nn_id"))
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
        broadcast(surv)
          .join(q.select(col("vec_id").as("nn_id"), col("qc").as("qc2")), "nn_id")
          .join(broadcast(q.filter(col("vec_id") <= 20)), "vec_id")
          .withColumn("score", Vectors.longDot(col("qc"), col("qc2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0) AS BIGINT)) AS qc
             |  FROM (SELECT vec_id, embedding,
             |          sqrt(list_reduce(list_transform(embedding, y -> CAST(y AS DOUBLE) * y),
             |                           (a, y) -> a + y)) AS nrm
             |        FROM embeddings) t),
             |mat AS (
             |  SELECT i.i AS i, j.j AS j,
             |    CASE WHEN ascii(substr(md5('rp:' || i.i || ':' || j.j), 1, 1)) % 2 = 0
             |         THEN 1 ELSE -1 END AS s
             |  FROM range(0, 32) i(i) CROSS JOIN range(0, 64) j(j)),
             |rp AS (
             |  SELECT q.vec_id, m.i, sum(q.qc[m.j + 1] * m.s)::BIGINT AS p
             |  FROM qv q CROSS JOIN mat m GROUP BY 1, 2),
             |rps AS (
             |  SELECT a.vec_id, b.vec_id AS nn_id, sum(a.p * b.p)::BIGINT AS rp_score
             |  FROM rp a JOIN rp b ON a.i = b.i AND a.vec_id <> b.vec_id
             |  WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |surv AS (
             |  SELECT vec_id, nn_id FROM (
             |    SELECT vec_id, nn_id,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY rp_score DESC, nn_id) AS rn_c
             |    FROM rps) t WHERE rn_c <= 100),
             |ex AS (
             |  SELECT c.vec_id, c.nn_id,
             |    list_sum(list_transform(range(1, 65), k -> a.qc[k] * b.qc[k]))::BIGINT AS score
             |  FROM surv c JOIN qv a ON a.vec_id = c.vec_id JOIN qv b ON b.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM ex) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // --------------------------------- IVF + SQ8 combined (the real
    // serving plan): coarse IVF quantizer prunes the corpus to the
    // query's own cluster, then the in-cluster candidates are scored on
    // int8 codes — the two scale levers composed exactly as a
    // production ANN index stores them (cluster-partitioned code
    // lists): the cluster cut bounds CANDIDATES (corpus/k per probe),
    // the codes bound BYTES per candidate (64 B vs 256 B) and make the
    // in-cluster scores integer-exact. Assignment is the proven
    // q_sim_ivf narrow centroid-literal argmax (no shuffle); codes are
    // the proven q_sim_quantized unit-sphere grid; the only wide
    // exchange is the cluster-key co-partition. Full value oracle:
    // DuckDB replays the assignment AND the integer dots bit-exactly.
    GQuery(
      "q_sim_ivf_sq",
      (s, dir) => {
        val emb = fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
          .withColumn("qc", Vectors.sq8(col("v"), col("nrm")))
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val cv = r.getSeq[Float](1)
            val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
            (r.getLong(0), cv, cnrm)
          }.sortBy(_._1).toSeq
        val scored = cents.map { case (cid, cv, cnrm) =>
          struct(
            (Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("c"),
            lit(-cid).as("nid"))
        }
        val assigned = emb
          .withColumn("cluster", -greatest(scored: _*).getField("nid"))
          .select(col("vec_id"), col("qc"), col("cluster"))
        val queries = assigned.filter(col("vec_id") <= 50)
        val corpus = assigned.select(col("vec_id").as("nn_id"),
          col("qc").as("qc2"), col("cluster"))
        val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
        queries.join(corpus, Seq("cluster"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("score", Vectors.longDot(col("qc"), col("qc2")))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (
             |  SELECT vec_id, list_transform(e,
             |    x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |  FROM (SELECT vec_id, e,
             |          sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |        FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |assigned AS (
             |  SELECT a.vec_id, q.qc, cluster FROM (
             |    SELECT vec_id, c_id AS cluster FROM (
             |      SELECT a.vec_id, c.c_id,
             |        row_number() OVER (PARTITION BY a.vec_id
             |          ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |      FROM v a CROSS JOIN cent c) z WHERE rn = 1) a
             |  JOIN qv q ON q.vec_id = a.vec_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT q.vec_id, x.vec_id AS nn_id,
             |    list_sum(list_transform(range(1, len(q.qc) + 1),
             |      i -> q.qc[i] * x.qc[i]))::BIGINT AS score,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_sum(list_transform(range(1, len(q.qc) + 1),
             |        i -> q.qc[i] * x.qc[i])) DESC, x.vec_id) AS rn
             |  FROM assigned q JOIN assigned x
             |    ON q.cluster = x.cluster AND q.vec_id <> x.vec_id
             |  WHERE q.vec_id <= 50) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin)),

    // ------------------------------------- product-quantized ANN (PQ)
    // The third compression rung of the ANN family (float32 256 B →
    // SQ8 64 B → PQ 16 codes ≈ 16 B/vector): split the SQ8 code into
    // 16 four-dim subspaces, quantize each to one of 32 sampled
    // codewords (first-32-by-id init — the deterministic IVF centroid
    // rule), and search in the FAISS refine shape: ADC (exact query
    // code · reconstructed codeword concat) prunes the corpus to the
    // top-50 candidates per query, and only those 50 rows evaluate the
    // exact-SQ8 re-rank dot. All-integer end to end, so the oracle
    // replays assignment, ADC, and re-rank bit-exactly; codeword count
    // and re-rank depth R are the recall dials (measured on this
    // fixture: overlap@5 vs exact = 0.61 at R=10, 0.895 at R=50 —
    // gated ≥ 0.8 in QueriesSpec beside the SQ8 gate). At 100 TB the
    // ADC scan touches 16 B/vector of code-list pages and the refine
    // fetches 64 B for 50·queries rows — the candidate-generation /
    // refine cost split every production PQ server runs.
    GQuery(
      "q_sim_pq",
      (s, dir) => {
        Vectors.pqSearch(Tables.embeddings(s, dir), "vec_id", "embedding",
            m = 16, ncw = 32, queryPred = col("vec_id") <= 20, candR = 50, k = 5)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a JOIN recon r ON a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // ----------------------------------------- binary (1-bit) ANN (BQ)
    // The LAST rung of the compression ladder (float32 256 B → SQ8
    // 64 B → PQ ~16 B → binary 8 B/vector): sign-bit codes packed into
    // two 32-bit words, HAMMING-ranked (bit_count ∘ xor — all integer,
    // ties to the lowest id) to candR candidates, exact-SQ8 re-rank on
    // the survivors. The standard billion-vector first-pass filter —
    // the hamming scan touches 8 B/vector, the memory-bandwidth floor.
    // Same scale-safe shape as q_sim_pq (queries broadcast, map-side
    // scoring over unmoved corpus splits, two-stage union-bound
    // candidate cut, survivor-only code fetch); recall vs the exact
    // float top-5 is measured and gated in QueriesSpec next to the
    // SQ8/PQ gates. Fully integer after packing → full value oracle.
    GQuery(
      "q_sim_binary",
      (s, dir) => {
        Vectors.binarySearch(Tables.embeddings(s, dir), "vec_id", "embedding",
            queryPred = col("vec_id") <= 20, candR = 50, k = 5)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |bits AS (SELECT vec_id,
             |    list_sum(list_transform(range(1, 33),
             |      j -> CASE WHEN e[j] > 0 THEN 1::BIGINT << (j - 1) ELSE 0 END))::BIGINT AS w0,
             |    list_sum(list_transform(range(33, 65),
             |      j -> CASE WHEN e[j] > 0 THEN 1::BIGINT << (j - 33) ELSE 0 END))::BIGINT AS w1
             |  FROM v),
             |ham AS (SELECT q.vec_id, c.vec_id AS nn_id,
             |    (bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)))::BIGINT AS ham
             |  FROM bits q JOIN bits c ON q.vec_id <> c.vec_id
             |  WHERE q.vec_id <= 20),
             |cand AS (SELECT vec_id, nn_id FROM (
             |    SELECT vec_id, nn_id,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY ham, nn_id) AS rn_c
             |    FROM ham) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // DISTRIBUTED PCA (power iteration) — the embedding-compression /
    // whitening stage of a training pipeline, decomposed the way 100 TB
    // forces: (1) ONE narrow pass materializes the corpus Gram matrix
    // over SQ8-quantized codes — a double per-row generate into dims²
    // cells with map-side partial aggregation, so only dims² longs per
    // partition ever cross the wire and the collected matrix is
    // METADATA (4096 longs), never data; (2) the dominant eigenvector
    // comes from Vectors.powerIterate — 3 rounds of exact-INTEGER
    // w = G·v with an integer rescale (sign-split div by a precomputed
    // scalar; trunc-vs-floor on negatives differs between engines), so
    // no float ever enters and the oracle replays training bit-for-bit
    // (the q_bpe_train rule applied to linear algebra); (3) the corpus
    // projects onto the eigen-direction through the codegen'd LongDot
    // against the 64-int literal — narrow, exact. Output: top-10 docs
    // by principal-component score.
    GQuery(
      "q_embed_pca",
      (s, dir) => {
        val q = Tables.embeddings(s, dir)
          .withColumn("nrm", Vectors.norm(col("embedding")))
          .select(col("vec_id"), Vectors.sq8(col("embedding"), col("nrm")).as("qc"))
          .cache() // feeds the Gram pass and the projection
        val g = q
          .select(col("qc"), posexplode(col("qc")).as(Seq("i", "qi")))
          .select(col("i"), col("qi"), posexplode(col("qc")).as(Seq("j", "qj")))
          .groupBy(col("i"), col("j")).agg(sum(col("qi") * col("qj")).as("g"))
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        val dims = g.keys.map(_._1).max + 1
        val v = Vectors.powerIterate(g, dims, iters = 3)
        q.select(col("vec_id"),
            graft.functions.LongDot(col("qc"), typedLit(v.toSeq)).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(10)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |idx AS (SELECT i FROM range(1, 65) r(i)),
             |g AS (SELECT a.i AS i, b.i AS j, sum(q.qc[a.i] * q.qc[b.i])::BIGINT AS g
             |      FROM qv q CROSS JOIN idx a CROSS JOIN idx b GROUP BY 1, 2),
             |w1 AS (SELECT i, sum(g)::BIGINT AS w FROM g GROUP BY i),
             |d1 AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w1),
             |v1 AS (SELECT i, CASE WHEN w >= 0 THEN w // d ELSE -((-w) // d) END AS v FROM w1, d1),
             |w2 AS (SELECT g.i, sum(g.g * v1.v)::BIGINT AS w FROM g JOIN v1 ON v1.i = g.j GROUP BY 1),
             |d2 AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w2),
             |v2 AS (SELECT i, CASE WHEN w >= 0 THEN w // d ELSE -((-w) // d) END AS v FROM w2, d2),
             |w3 AS (SELECT g.i, sum(g.g * v2.v)::BIGINT AS w FROM g JOIN v2 ON v2.i = g.j GROUP BY 1),
             |d3 AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w3),
             |v3 AS (SELECT i, CASE WHEN w >= 0 THEN w // d ELSE -((-w) // d) END AS v FROM w3, d3),
             |sc AS (SELECT q.vec_id, sum(q.qc[v3.i] * v3.v)::BIGINT AS score
             |       FROM qv q CROSS JOIN v3 GROUP BY 1)
             |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)),

    // ------------------------------- IVF ∘ PQ composed serving (ANN)
    // The production serving plan, fully composed — the FAISS
    // `IVFPQ,Refine` shape that q_sim_ivf_sq and q_sim_pq each built
    // half of: the coarse quantizer (q_sim_ivf's narrow centroid-
    // literal argmax over the 9 seed centroids vec_id ≤ 8 — the
    // q_sim_ivf/q_sim_ivf_sq convention; the SERVED twin below uses
    // kmeans' first-8 init, vec_id < 8) files every vector in
    // ONE cluster and cuts each query's candidates to its own cluster
    // BEFORE any per-candidate work; ADC (query SQ8 code · PQ-
    // reconstructed codeword concat, 16×32 codebook) ranks the
    // in-cluster code list to 50 survivors; only those evaluate the
    // exact-SQ8 re-rank dot. What this composition retires vs q_sim_pq:
    // the whole-corpus BROADCAST (the build side outgrows executors at
    // scale) and the per-query GLOBAL window over all corpus rows —
    // replaced by the cluster-key co-partition join, the plan's ONLY
    // wide exchange. Per-query touched bytes at 100 TB: (corpus/k)·16
    // code bytes for ADC + 50·64 B for refine; the corpus shuffles
    // once at index build, never per query. All-integer after the
    // coarse assign → full value oracle, bit-exact tie-breaks. nprobe
    // and candR are the two recall dials (gated in QueriesSpec vs the
    // float ground truth beside the SQ8/PQ gates).
    GQuery(
      "q_sim_ivf_pq",
      (s, dir) => {
        val cents = Tables.embeddings(s, dir).filter(col("vec_id") <= 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        Vectors.ivfPqSearch(Tables.embeddings(s, dir), "vec_id", "embedding",
            cents, m = 16, ncw = 32, queryPred = col("vec_id") <= 20,
            nprobe = 1, candR = 50, k = 5)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id <= 8),
             |asg AS (SELECT vec_id, c_id AS cluster FROM (
             |          SELECT a.vec_id, c.c_id,
             |            row_number() OVER (PARTITION BY a.vec_id
             |              ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |          FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a
             |        JOIN asg qa ON qa.vec_id = a.vec_id
             |        JOIN asg ra ON ra.cluster = qa.cluster
             |        JOIN recon r ON r.vec_id = ra.vec_id AND a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin)),

    // The SAME composed IVF∘PQ search served from the PERSISTED index
    // (ops/IvfPqIndex): built once per sf (cached fixture — k=8
    // centroids at iters=0 = the deterministic first-8-BY-ID init, so
    // the oracle replays them as vec_id < 8; 16×32 codebook from the
    // first-32-by-id SQ8 codes, same rule as q_sim_pq), then every
    // invocation reads centroids + codebook metadata and ONLY the
    // probed cluster partitions of the two stored tiers: the m-byte
    // PQ code lists for the ADC cut (reconstructed at serve time from
    // codes + codebook literals — the index ships codes, never
    // reconstructions) and the exact-SQ8 refine tier for the candR
    // survivors. What verify value-checks beyond q_sim_ivf_pq: the
    // full build/serve lifecycle — parquet round-trip of centroids/
    // codebook/codes, two-tier partition pruning, delta-union read
    // path — against the identical all-integer DuckDB semantics.
    GQuery(
      "q_sim_ivf_pq_served",
      (s, dir) => {
        val sfKey = sfFingerprint(dir)
        val idxDir = cachedFixture(s"graft_ivfpq_cache_v1_$sfKey") { root =>
          IvfPqIndex.build(s, root + "/idx", fanout(Tables.embeddings(s, dir)),
            "vec_id", "embedding", k = 8, iters = 0, m = 16, ncw = 32)
        } + "/idx"
        IvfPqIndex.topK(s, idxDir,
            Tables.embeddings(s, dir).filter(col("vec_id") <= 20),
            "vec_id", "embedding", k = 5, nprobe = 1, candR = 50)
          .orderBy(col("vec_id"), col("rn"))
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |qv AS (SELECT vec_id, list_transform(e, x -> CAST(floor(x / nrm * 127.0) AS BIGINT)) AS qc
             |       FROM (SELECT vec_id, e,
             |               sqrt(list_reduce(list_transform(e, y -> y * y), (a, y) -> a + y)) AS nrm
             |             FROM v) t),
             |cent AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < 8),
             |asg AS (SELECT vec_id, c_id AS cluster FROM (
             |          SELECT a.vec_id, c.c_id,
             |            row_number() OVER (PARTITION BY a.vec_id
             |              ORDER BY list_cosine_similarity(a.e, c.ce) DESC, c.c_id) AS rn
             |          FROM v a CROSS JOIN cent c) z WHERE rn = 1),
             |cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id, qc AS cqc
             |       FROM qv ORDER BY vec_id LIMIT 32),
             |sub AS (SELECT q.vec_id, r.m, c.cw_id,
             |          list_sum(list_transform(range(1, 5),
             |            i -> (q.qc[r.m*4+i] - c.cqc[r.m*4+i]) * (q.qc[r.m*4+i] - c.cqc[r.m*4+i])))::BIGINT AS dist
             |        FROM qv q CROSS JOIN range(0, 16) r(m) CROSS JOIN cw c),
             |best AS (SELECT vec_id, m, cw_id FROM (
             |           SELECT vec_id, m, cw_id,
             |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cw_id) AS rn
             |           FROM sub) z WHERE rn = 1),
             |recon AS (SELECT b.vec_id, b.m, c.cqc FROM best b JOIN cw c ON b.cw_id = c.cw_id),
             |adc AS (SELECT a.vec_id, r.vec_id AS nn_id,
             |          sum(list_sum(list_transform(range(1, 5),
             |            i -> a.qc[r.m*4+i] * r.cqc[r.m*4+i])))::BIGINT AS adc
             |        FROM qv a
             |        JOIN asg qa ON qa.vec_id = a.vec_id
             |        JOIN asg ra ON ra.cluster = qa.cluster
             |        JOIN recon r ON r.vec_id = ra.vec_id AND a.vec_id <> r.vec_id
             |        WHERE a.vec_id <= 20 GROUP BY 1, 2),
             |cand AS (SELECT vec_id, nn_id FROM (
             |           SELECT vec_id, nn_id,
             |             row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, nn_id) AS rn_c
             |           FROM adc) z WHERE rn_c <= 50),
             |rr AS (SELECT c.vec_id, c.nn_id,
             |         list_sum(list_transform(range(1, len(a.qc) + 1), i -> a.qc[i] * x.qc[i]))::BIGINT AS score
             |       FROM cand c JOIN qv a ON a.vec_id = c.vec_id JOIN qv x ON x.vec_id = c.nn_id)
             |SELECT vec_id, CAST(rn AS INT) AS rn, nn_id, score FROM (
             |  SELECT vec_id, nn_id, score,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn
             |  FROM rr) t
             |WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin))
  )
}
