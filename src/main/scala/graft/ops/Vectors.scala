package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector primitives: cosine similarity, brute-force top-k
  * ANN baseline, and the sign-LSH bucketed scale path — all over plain
  * `array<float>` columns via codegen'd higher-order functions (no UDF,
  * no linear-algebra dependency).
  *
  * Scale story (100 TB of vectors): brute-force top-k is the correctness
  * baseline and is quadratic — fine for ≤10^5 vectors with a broadcast
  * side, wrong beyond. The bucketed variants cut candidate pairs by the
  * bucket factor (2^bits) at a small recall cost; at real scale you raise
  * `bits`, shuffle once on the bucket key, and each bucket's pairwise
  * work is independent and balanced (random hyperplane signs distribute
  * uniformly).
  */
object Vectors {

  /** Σ a_i·b_i in double precision, sequential fold (deterministic and
    * reproducible by any engine that folds left-to-right). Backed by the
    * codegen'd [[graft.functions.FloatDot]] Catalyst expression — the
    * composed higher-order form ([[dotComposed]]) is CodegenFallback and
    * profiled ~10× slower; both produce bitwise-identical sums. */
  def dot(a: Column, b: Column): Column = graft.functions.FloatDot(a, b)

  /** The built-in-composed twin of [[dot]] (kept as the semantic
    * reference; the OpsSpec equivalence test pins them together). */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σ a_i·b_i over two `array<bigint>` CODE columns (SQ8 codes, PQ
    * reconstructions) — exact integer, order-independent, backed by the
    * codegen'd [[graft.functions.LongDot]]; [[longDotComposed]] is the
    * interpreted semantic reference the OpsSpec equivalence test pins. */
  def longDot(a: Column, b: Column): Column = graft.functions.LongDot(a, b)

  def longDotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Deterministic "random" hyperplanes for sign-LSH: component d of
    * plane i is `(splitmix64(seed, i, d) mod 129 - 64) / 64` ∈ [-1, 1].
    * Dyadic k/64 rationals are EXACTLY representable in both float and
    * double, and each product v_d·h_d (≤24-bit × ≤7-bit significand) is
    * an exact double, so the dot's sign is identical on any engine that
    * sums exactly-representable terms — the constants embed verbatim in
    * a SQL oracle and the bucketing replays bit-for-bit. splitmix64 is
    * the public-domain finalizer (Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA'14). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] =
    (0 until bits).map { i =>
      Array.tabulate(dim) { d =>
        var z = seed + (i.toLong * dim + d + 1) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        (java.lang.Math.floorMod(z, 129L) - 64L) / 64.0
      }
    }

  /** Random-hyperplane sign signature (SimHash over the embedding,
    * Charikar STOC'02): bit i = [v·h_i ≥ 0]. Unlike an axis-aligned
    * first-k-dims sign key, recall does not collapse when leading
    * dimensions are correlated or hover near zero — every dimension
    * contributes to every bit. P(bit agrees) = 1 − θ(a,b)/π. */
  def signBucket(v: Column, planes: Seq[Array[Double]]): Column =
    concat_ws("", planes.map { h =>
      when(dot(v, typedLit(h.map(_.toFloat).toSeq)) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Brute-force exact cosine top-k: every vector against every other.
    * `right` is broadcast — ship the small side to all executors, never
    * shuffle the big side. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val withNorm = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
    val left = withNorm
    val right = broadcast(withNorm
      .select(col("vec_id").as("nn_id"), col("v").as("v2"), col("nrm").as("nrm2")))
    val pairs = left.join(right, col("vec_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
  }

  /** Assign every vector to its `n` nearest centroids by cosine (ties
    * to the lower centroid id). Centroids are INDEX METADATA — k
    * vectors, driver-sized even at k=thousands — so they are collected
    * once and embedded as literals: the assignment is a NARROW per-row
    * sort of k (cos, -c_id) structs, zero joins and zero shuffles.
    * This is what makes every consumer scale: each Lloyd iteration
    * ([[kmeans]]) and every [[ivfTopK]]/[[IvfIndex]] probe previously
    * paid a full-corpus shuffle (join + per-vector row_number window)
    * just to pick per-row maxima. Ordering matches the old window's
    * ORDER BY exactly: cos desc, nulls last (malformed embeddings),
    * ties to the lower centroid id. Returns one row per (vector,
    * probed cluster): (id, v, nrm, cluster, cos, probe). */
  def assignTopN(emb: DataFrame, idCol: String, vecCol: String,
                 cents: DataFrame, n: Int): DataFrame = {
    // driver-side norm replays FloatDot's fold exactly (sequential
    // left-to-right sum of float→double products) — bit-identical to
    // the norm(cv) column the broadcast join used to compute
    val centSeq = cents.select(col("c_id").cast("long"), col("cv")).collect()
      .map { r =>
        val cv = r.getSeq[Float](1)
        (r.getLong(0), cv, math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
      }.sortBy(_._1).toSeq
    require(centSeq.nonEmpty, "assignTopN needs at least one centroid")
    val scored = centSeq.map { case (cid, cv, cnrm) =>
      val ccos = dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cnrm))
      // sort key replays (ccos desc NULLS LAST, c_id asc) after the
      // reverse: ok=false (null cos) sinks, -c_id breaks ties low-first
      struct(ccos.isNotNull.as("ok"), ccos.as("ccos"), lit(-cid).as("nid"))
    }
    emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("top", slice(reverse(array_sort(array(scored: _*))), 1, n))
      .select(col("vec_id"), col("v"), col("nrm"), posexplode(col("top")))
      .select(col("vec_id"), col("v"), col("nrm"),
        (-col("col.nid")).as("cluster"), col("col.ccos").as("cos"),
        (col("pos") + 1).as("probe"))
  }

  /** Single nearest-centroid assignment (the Lloyd/IVF-build case). */
  def assignToCentroids(emb: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame): DataFrame =
    assignTopN(emb, idCol, vecCol, cents, 1).drop("probe")

  /** IVF top-k ANN with multi-probe: the corpus lives in its nearest
    * cluster, each query probes its `nprobe` nearest clusters and takes
    * the exact top-k within them. nprobe is THE recall/cost dial: a
    * query near a cluster boundary misses neighbors filed on the other
    * side with nprobe=1; probing the next-nearest cluster(s) recovers
    * them for nprobe× the in-cluster work — same plan shape (narrow
    * assign, one shuffle on the cluster key), recall gated in OpsSpec
    * against the brute-force ground truth. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, cents: DataFrame,
              k: Int, nprobe: Int, queryPred: Column): DataFrame = {
    val corpus = assignTopN(emb, idCol, vecCol, cents, 1)
      .select(col("cluster"), col("vec_id").as("nn_id"),
        col("v").as("v2"), col("nrm").as("nrm2"))
    val queries = assignTopN(emb.filter(queryPred), idCol, vecCol, cents, nprobe)
      .select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
    queries.join(corpus, Seq("cluster"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
  }

  /** Cross-corpus threshold ANN JOIN — every query vector against a
    * (typically disjoint) corpus, returning ALL corpus neighbors with
    * cosine above `threshold` (threshold semantics, not top-k: this is
    * the embedding-decontamination / record-linkage shape, where every
    * hit matters). The corpus lives in its single nearest cluster; each
    * query multi-probes its `nprobe` nearest — at nprobe = |centroids|
    * the join is exhaustive and exactly equals the brute-force result
    * (OpsSpec pins this), in between it trades boundary-pair recall for
    * a 1/k candidate cut. The only wide exchange is the cluster-key
    * co-partition join; a (query, neighbor) pair appears at most once
    * because the corpus side owns exactly one cluster. */
  def annJoin(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              cents: DataFrame, nprobe: Int, threshold: Double): DataFrame = {
    val c = assignTopN(corpus, idCol, vecCol, cents, 1)
      .select(col("cluster"), col("vec_id").as("nn_id"),
        col("v").as("v2"), col("nrm").as("nrm2"))
    val q = assignTopN(queries, idCol, vecCol, cents, nprobe)
      .select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
    q.join(c, Seq("cluster"))
      .withColumn("cos", cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
      .filter(col("cos") > threshold)
      .select(col("vec_id"), col("nn_id"), round(col("cos"), 4).as("cos"))
  }

  /** Distributed SPHERICAL Lloyd k-means over array<float> embeddings —
    * trains the IVF coarse quantizer (q_sim_ivf's first-k centroids are
    * the deterministic time-zero init; this is the refinement a real
    * index build runs). Per iteration: NARROW centroid-literal assign
    * by cosine ([[assignTopN]] — no shuffle), then recompute each
    * centroid as the element-wise mean of its members' UNIT vectors
    * (the direction maximizing Σcos — the raw-vector mean would weight
    * members by norm and can raise cosine inertia), exploding members
    * to (cluster, dim, value) rows — the only shuffles per iteration
    * are the two mean aggregations; centroids (k×dim doubles) are the
    * ONLY driver-side data. Init = first k vectors by id (deterministic,
    * like the query). Empty clusters keep their previous centroid.
    * Returns the final (c_id, cv) centroid DataFrame. */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame = {
    var cents = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("c_id"), col(vecCol).as("cv"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = assignToCentroids(emb, idCol, vecCol, cents)
      val means = assigned
        .select(col("cluster"), col("nrm"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cluster"), col("d"))
        .agg(avg(col("x") / col("nrm")).as("m")) // mean of UNIT vectors
        .groupBy(col("cluster"))
        .agg(transform(sort_array(collect_list(struct(col("d"), col("m")))),
          e => e.getField("m").cast("float")).as("cv2"))
      cents = cents.join(means, cents("c_id") === means("cluster"), "left")
        .select(col("c_id"), coalesce(col("cv2"), col("cv")).as("cv"))
        .localCheckpoint() // truncate the iterative lineage
    }
    cents
  }

  /** Mean cosine distance of every vector to its assigned centroid —
    * the (cosine-form) k-means objective; Lloyd iterations must not
    * increase it. */
  def inertia(emb: DataFrame, idCol: String, vecCol: String,
              cents: DataFrame): Double =
    assignToCentroids(emb, idCol, vecCol, cents)
      .agg(avg(lit(1.0) - col("cos"))).head().getDouble(0)

  /** In-cluster cosine near-dup pairs — the SemDeDup core (Abbas et al.
    * 2023, arXiv:2303.09540): assign every vector to its nearest
    * centroid (narrow centroid-literal argmax, zero shuffles), generate
    * pairs ONLY within clusters (ONE shuffle on the cluster key).
    * Candidate pairs ≈ Σ_c n_c²/2 ≈ n²/2k for balanced clusters — k is
    * the dial that keeps semantic dedup feasible at corpus scale.
    * Returns (id_a, id_b) with id_a < id_b and cosine > threshold. */
  def semanticPairs(emb: DataFrame, idCol: String, vecCol: String,
                    cents: DataFrame, threshold: Double): DataFrame = {
    // r21 (guide §1): the centroid assignment (8-way cross score +
    // per-vector argmin window — the expensive narrow pipeline) feeds
    // BOTH sides of the in-cluster self-join below; without a
    // materialization it executed twice per run (two ~0.35 s jobs in
    // the q_dedup_semantic profile). Checkpoint the narrow
    // (cluster, id, v, nrm) assignment once — node-sized, never
    // pair-sized — and self-join the materialized rows.
    val assigned = assignToCentroids(emb, idCol, vecCol, cents).localCheckpoint()
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb"), col("na"), col("nb")) > threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Total in-cluster CANDIDATE pairs Σ_c n_c·(n_c−1)/2 under a given
    * quantizer — the pairwise-work bound semanticPairs actually pays
    * (before the threshold filter). The spec gate for trained vs
    * untrained centroids and the SCALE.md pair-count-vs-k rows both
    * measure this. */
  def semanticCandidatePairs(emb: DataFrame, idCol: String, vecCol: String,
                             cents: DataFrame): Long = {
    val r = assignToCentroids(emb, idCol, vecCol, cents)
      .groupBy(col("cluster")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long"))).head()
    // sum() over zero groups is NULL, not 0 — an empty corpus has zero
    // candidate pairs (mirrors pagerank's own n==0 handling)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Full SemDeDup pipeline with a TRAINED coarse quantizer: spherical
    * k-means ([[kmeans]], `iters` Lloyd rounds from the deterministic
    * first-k init) → in-cluster pairs → connected components → every
    * vector labeled with its semantic-group representative (component
    * min). `iters = 0` degrades to the untrained first-k quantizer the
    * oracled q_dedup_semantic replays. At corpus scale k must grow with
    * n ([[semanticK]]) — training keeps clusters balanced so the n²/k
    * bound holds with a real constant. Returns (vec_id, rep_id). */
  def semanticGroups(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, k: Int, iters: Int): DataFrame = {
    val cents = kmeans(emb, idCol, vecCol, k, iters)
    val pairs = semanticPairs(emb, idCol, vecCol, cents, threshold)
    Components.connectedComponents(emb.select(col(idCol)), pairs)
      .select(col("id").as("vec_id"), col("lab").as("rep_id"))
  }

  /** Corpus-scale rule for the quantizer size: k = ⌈n / target⌉ keeps
    * the EXPECTED cluster population at `targetClusterSize`, so
    * in-cluster pairwise work stays ≈ n·target/2 — LINEAR in n with the
    * constant you chose, instead of n²/k with a fixed k. (SemDeDup used
    * k = 11k clusters for 100M+ embeddings ≈ 10⁴ per cluster; 1024
    * keeps per-cluster work trivially executor-sized.) */
  def semanticK(n: Long, targetClusterSize: Int = 1024): Int =
    math.max(1, ((n + targetClusterSize - 1) / targetClusterSize).toInt)

  /** Near-duplicate pairs by cosine threshold, candidate-limited to
    * random-hyperplane sign-LSH buckets: one shuffle on the bucket key,
    * pairwise work only within buckets. `dim` sizes the hyperplanes
    * (embedding dimensionality); `seed` makes the bucketing
    * deterministic and oracle-replayable. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bits: Int = 8, dim: Int = 64,
                   seed: Long = 42L): DataFrame = {
    val withMeta = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", signBucket(col("v"), hyperplanes(bits, dim, seed)))
    val a = withMeta.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = withMeta.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  // ------------------------------------------------ product quantization
  // PQ (Jégou et al., "Product Quantization for Nearest Neighbor
  // Search", TPAMI 2011): split the SQ8 code into m subspaces, quantize
  // each to one of ncw codewords, store m SMALL codes per vector (m
  // bytes at ncw ≤ 256 — an 8× cut below SQ8's dim bytes, 16× below
  // float32). Search is ADC: the exact query code dots against each
  // candidate's RECONSTRUCTED codeword concat, then the top-R survivors
  // re-rank on their exact SQ8 codes — the FAISS IVFPQ+refine serving
  // shape. Everything is integer, so scores are bit-identical across
  // engines and partitionings (full value oracle, no rounding).

  /** SQ8 unit-sphere grid code (the q_sim_quantized grid): one bigint
    * per dimension in [-127, 127]. `nrm` must be [[norm]] of `v` — the
    * caller computes it once per row instead of per element. */
  def sq8(v: Column, nrm: Column): Column =
    transform(v, x => floor(x.cast("double") / nrm * 127.0).cast("long"))

  /** Per-subspace PQ codebook sampled from the first `ncw` rows by id —
    * deterministic, oracle-replayable init (the IVF centroid rule).
    * Returns, per subspace, the (codewordId, subCode) list; driver-side
    * ncw×dim longs — index metadata under the bounded-collect rule. */
  def pqCodebook(codes: DataFrame, idCol: String, codeCol: String,
                 m: Int, ncw: Int): Seq[Seq[(Long, Seq[Long])]] = {
    val sample = codes.orderBy(col(idCol)).limit(ncw)
      .select(col(codeCol)).collect()
      .map(_.getSeq[Long](0))
    require(sample.nonEmpty,
      "pqCodebook: empty codes input — a PQ codebook needs at least one " +
        "sampled vector (mirrors assignTopN's centroid guard)")
    val d = sample.head.length / m
    (0 until m).map { mm =>
      sample.toSeq.zipWithIndex.map { case (qc, j) =>
        (j.toLong, qc.slice(mm * d, mm * d + d))
      }
    }
  }

  /** Per-subspace Lloyd-TRAINED PQ codebook: k-means in each of the m
    * subspaces over the SQ8 sub-codes, initialized from the sampled
    * [[pqCodebook]] — `iters = 0` degrades to it exactly (the
    * trained-vs-untrained convention of [[kmeans]], so oracled queries
    * stay on the replayable sampled init and training is a spec-gated
    * quality dial). Assignment is the codegen'd
    * [[graft.functions.PqEncode]] kernel (integer L2, ties to lowest
    * id); the update step averages each codeword's members per
    * dimension with an EXACT long sum (order-independent) and rounds
    * back to the long grid, so training is deterministic on any
    * partitioning. Per iteration: one corpus encode pass + an
    * (m·ncw·d)-row aggregate — codebook metadata under the
    * bounded-collect rule. Codewords that lose all members keep their
    * previous value (the kmeans empty-cluster rule). */
  def pqCodebookTrained(codes: DataFrame, idCol: String, codeCol: String,
                        m: Int, ncw: Int, iters: Int): Seq[Seq[(Long, Seq[Long])]] = {
    var cb = pqCodebook(codes, idCol, codeCol, m, ncw)
    val d = cb.head.head._2.length
    for (_ <- 0 until iters) {
      val cbVals = cb.map(_.map(_._2))
      val sums = codes
        .select(graft.functions.PqEncode.codes(col(codeCol), cbVals).as("cw"),
          col(codeCol).as("qc"))
        .select(posexplode(col("cw")).as(Seq("mm", "cwid")), col("qc"))
        .select(col("mm"), col("cwid"),
          posexplode(slice(col("qc"), col("mm") * lit(d) + lit(1), lit(d)))
            .as(Seq("dd", "x")))
        .groupBy(col("mm"), col("cwid"), col("dd"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getLong(1).toInt, r.getInt(2)),
          math.round(r.getLong(3).toDouble / r.getLong(4))))
        .toMap
      cb = (0 until m).map { mm =>
        (0 until ncw).map { j =>
          val old = cb(mm)(j)._2
          (j.toLong, (0 until d).map(dd => sums.getOrElse((mm, j, dd), old(dd))))
        }
      }
    }
    cb
  }

  /** Total integer squared-L2 reconstruction error of a codebook over
    * a code corpus — the PQ training objective; Lloyd iterations must
    * not increase it. Exact long arithmetic end to end, so the value
    * is deterministic on any partitioning (the spec gates compare
    * exact equals-or-decreases, never approximate). */
  def pqDistortion(codes: DataFrame, codeCol: String,
                   cb: Seq[Seq[(Long, Seq[Long])]]): Long = {
    val r = codes.agg(sum(graft.functions.LongL2(col(codeCol),
      graft.functions.PqEncode.recon(col(codeCol), cb.map(_.map(_._2)))))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** PQ code assignment, COMPOSED reference form: per subspace, argmin
    * integer L2 distance to the codeword literals via an encoded
    * (dist·64 + cw) `least` fold (requires ncw ≤ 64), ties to the
    * LOWEST codeword id. At m·ncw ≥ ~512 the inlined fold blows the
    * JVM method limit and the projection silently interprets — the hot
    * path is [[graft.functions.PqEncode]] (constant generated-code
    * size; the OpsSpec equivalence test pins the two together). */
  def pqAssign(code: Column, cb: Seq[Seq[(Long, Seq[Long])]]): Seq[Column] = {
    val m = cb.length
    val d = cb.head.head._2.length
    require(cb.head.length <= 64, "encoded argmin requires ncw <= 64")
    (0 until m).map { mm =>
      val sub = slice(code, mm * d + 1, d)
      val encoded = cb(mm).map { case (cwId, cwSub) =>
        graft.functions.LongL2(sub, typedLit(cwSub)) * lit(64L) + lit(cwId)
      }
      pmod(least(encoded: _*), lit(64L)).as(s"pq_code_$mm")
    }
  }

  /** Decode: concat of each assigned codeword's sub-code (map-literal
    * lookups — the ADC scan never touches the original vectors). */
  def pqRecon(codeCols: Seq[Column], cb: Seq[Seq[(Long, Seq[Long])]]): Column =
    concat(codeCols.zip(cb).map { case (c, cwList) =>
      element_at(typedLit(cwList.toMap), c)
    }: _*)

  /** FLAT-PQ ANN search with exact re-rank: ADC top-`candR` candidate
    * cut on the reconstructed codes, exact-SQ8 integer re-rank of the
    * survivors, top-`k` out. Flat PQ (no coarse quantizer — FAISS's
    * `PQm` index) is inherently a linear scan of the code list per
    * query; what this plan guarantees is that the scan SCALES: the
    * QUERIES broadcast (a handful of rows) while the corpus code list
    * never moves — ADC evaluates map-side over each corpus split — and
    * the candidate cut is two-stage: a partition-local top-candR bounds
    * any one task's state to its own split, then a global merge ranks
    * the ≤ splits·candR survivors (exact by the union bound: a row in
    * the global top-candR under the (adc DESC, nn_id) total order is
    * necessarily in its own partition's top-candR, so the local cut
    * never drops a global survivor — same scores, same rows as a
    * single global window). Only survivors fetch their exact SQ8 codes
    * for the re-rank, so the wide 64 B code column never rides the
    * candidate shuffle — candidate rows are (query, nn_id, adc) thin.
    * There is NO whole-corpus broadcast and NO corpus-sized window
    * partition anywhere; for the sub-linear candidate-generation
    * alternative see [[ivfPqSearch]] (the `IVFPQ,Refine` production
    * path). Returns (vec_id, rn, nn_id, score). */
  def pqSearch(emb: DataFrame, idCol: String, vecCol: String,
               m: Int, ncw: Int, queryPred: Column,
               candR: Int, k: Int, trainIters: Int = 0): DataFrame = {
    // single-file fixtures arrive as ONE split — spread the rows before
    // the interpreted HOF projections (assign/recon/ADC) or they run on
    // one core; a no-op cost on a real many-split corpus
    val coded = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("qc", sq8(col("v"), col("nrm")))
      .select(col("vec_id"), col("qc"))
    val cb = pqCodebookTrained(coded, "vec_id", "qc", m, ncw, trainIters)
    val queries = coded.filter(queryPred).select(col("vec_id"), col("qc").as("q_qc"))
    // map-side ADC: corpus splits stay put, queries come to them
    val scored = coded
      .withColumn("recon",
        graft.functions.PqEncode.recon(col("qc"), cb.map(_.map(_._2))))
      .select(col("vec_id").as("nn_id"), col("recon"))
      .join(broadcast(queries), col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"),
        longDot(col("q_qc"), col("recon")).as("adc"),
        spark_partition_id().as("p"))
    val wLoc = Window.partitionBy(col("vec_id"), col("p"))
      .orderBy(col("adc").desc, col("nn_id"))
    val wAdc = Window.partitionBy(col("vec_id")).orderBy(col("adc").desc, col("nn_id"))
    val cand = scored
      .withColumn("rn_l", row_number().over(wLoc)).filter(col("rn_l") <= candR)
      .withColumn("rn_c", row_number().over(wAdc)).filter(col("rn_c") <= candR)
      .select(col("vec_id"), col("nn_id"))
    // refine: exact SQ8 codes fetched ONLY for the candR survivors per
    // query — the tiny survivor set broadcasts back against the corpus
    val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
    coded.select(col("vec_id").as("nn_id"), col("qc").as("qc2"))
      .join(broadcast(cand.join(queries, "vec_id")), "nn_id")
      .withColumn("score", longDot(col("q_qc"), col("qc2")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
  }

  /** One 32-bit word of the sign-bit binary code: bit j-of-word set
    * when dimension `off + j` is positive. Sign is invariant under the
    * positive L2 normalization, so packing reads the RAW floats — no
    * corpus statistics, no normalization pass, bit-identical on any
    * engine (float > 0 is exact). Two words cover the 64-dim fixture
    * without ever shifting into the sign bit of a signed 64-bit int
    * (DuckDB has no unsigned BIGINT shift-safe literal path). */
  def binaryWord(v: Column, off: Int): Column =
    (0 until 32).map { j =>
      when(element_at(v, off + j + 1) > lit(0f), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** BINARY (1-bit) quantized ANN with exact re-rank — the last rung of
    * the compression ladder (float32 256 B → SQ8 64 B → PQ ~16 B →
    * binary 8 B/vector): sign-bit codes ranked by HAMMING distance
    * (`bit_count(xor)` over two 32-bit words — integer-exact, ties to
    * the lowest id), top-`candR` survivors re-ranked by the exact-SQ8
    * integer dot. Same scale guarantees as [[pqSearch]]'s round-13
    * shape: QUERIES broadcast while the corpus code list never moves
    * (hamming evaluates map-side over each corpus split), the candidate
    * cut is two-stage partition-local ∪ global (exact by the union
    * bound under the (ham ASC, nn_id) total order), and survivors fetch
    * their exact codes by join so the wide code column never rides the
    * candidate shuffle. At 100 TB the hamming scan touches 8 B/vector —
    * the memory-bandwidth floor of the ANN family — which is precisely
    * why binary codes are the standard first-pass filter for
    * billion-vector serving. Returns (vec_id, rn, nn_id, score). */
  def binarySearch(emb: DataFrame, idCol: String, vecCol: String,
                   queryPred: Column, candR: Int, k: Int): DataFrame = {
    val coded = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("qc", sq8(col("v"), col("nrm")))
      .withColumn("w0", binaryWord(col("v"), 0))
      .withColumn("w1", binaryWord(col("v"), 32))
      .select(col("vec_id"), col("qc"), col("w0"), col("w1"))
    val queries = coded.filter(queryPred)
      .select(col("vec_id"), col("qc").as("q_qc"),
        col("w0").as("q_w0"), col("w1").as("q_w1"))
    val scored = coded
      .select(col("vec_id").as("nn_id"), col("w0"), col("w1"))
      .join(broadcast(queries), col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"),
        (bit_count(col("w0").bitwiseXOR(col("q_w0"))) +
          bit_count(col("w1").bitwiseXOR(col("q_w1")))).cast("long").as("ham"),
        spark_partition_id().as("p"))
    val wLoc = Window.partitionBy(col("vec_id"), col("p"))
      .orderBy(col("ham"), col("nn_id"))
    val wHam = Window.partitionBy(col("vec_id")).orderBy(col("ham"), col("nn_id"))
    val cand = scored
      .withColumn("rn_l", row_number().over(wLoc)).filter(col("rn_l") <= candR)
      .withColumn("rn_c", row_number().over(wHam)).filter(col("rn_c") <= candR)
      .select(col("vec_id"), col("nn_id"))
    val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
    coded.select(col("vec_id").as("nn_id"), col("qc").as("qc2"))
      .join(broadcast(cand.join(queries.select(col("vec_id"), col("q_qc")), "vec_id")), "nn_id")
      .withColumn("score", longDot(col("q_qc"), col("qc2")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
  }

  /** The COMPOSED production ANN serving plan — IVF∘PQ with exact
    * re-rank (the FAISS `IVFPQ,Refine` shape): the coarse quantizer
    * cuts candidates to the query's `nprobe` nearest clusters BEFORE
    * any per-candidate work, then ADC (query SQ8 code · reconstructed
    * PQ codeword concat) ranks the in-cluster code list down to `candR`
    * survivors, and only those rows evaluate the exact-SQ8 re-rank dot.
    * This replaces [[pqSearch]]'s whole-corpus broadcast + per-query
    * GLOBAL window — the two structures that cannot survive a corpus
    * that outgrows one executor — with the cluster-key co-partition
    * join, the ONE wide exchange ([[ivfTopK]]'s). Per 100 TB query the
    * touched bytes are nprobe·(corpus/k)·~m code bytes for ADC plus
    * candR·dim bytes for refine; the corpus never re-shuffles per
    * query. All-integer after the coarse assign, so ADC, re-rank, and
    * tie-breaks replay bit-exactly on any engine (full value oracle).
    *
    * Windows partition by vec_id across the query's probed clusters, so
    * with nprobe > 1 the ADC cut is global over all probed candidates —
    * identical semantics to a per-cluster cut ∪ merge at the same candR.
    * `cents` is (c_id, cv) index metadata (the [[assignTopN]] rule). */
  def ivfPqSearch(emb: DataFrame, idCol: String, vecCol: String,
                  cents: DataFrame, m: Int, ncw: Int, queryPred: Column,
                  nprobe: Int, candR: Int, k: Int, trainIters: Int = 0): DataFrame = {
    // single-file fixtures arrive as ONE split — spread before the
    // interpreted HOF projections (sq8/recon); no-op on a real corpus
    val base = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
    // corpus side: every vector in its ONE nearest cluster, carrying
    // only its codes (the cluster-partitioned code list an IVFPQ index
    // stores — the float vector is dropped after encoding)
    val corpusCoded = assignToCentroids(base, idCol, vecCol, cents)
      .withColumn("qc", sq8(col("v"), col("nrm")))
      .select(col("vec_id"), col("qc"), col("cluster"))
    val cb = pqCodebookTrained(corpusCoded, "vec_id", "qc", m, ncw, trainIters)
    val corpus = corpusCoded
      .withColumn("recon",
        graft.functions.PqEncode.recon(col("qc"), cb.map(_.map(_._2))))
      .select(col("cluster"), col("vec_id").as("nn_id"),
        col("recon"), col("qc").as("qc2"))
    // query side: nprobe nearest clusters each (the recall dial that
    // recovers boundary neighbors filed on the other side)
    val queries = assignTopN(base.filter(queryPred), idCol, vecCol, cents, nprobe)
      .withColumn("qc", sq8(col("v"), col("nrm")))
      .select(col("cluster"), col("vec_id"), col("qc"))
    val wAdc = Window.partitionBy(col("vec_id")).orderBy(col("adc").desc, col("nn_id"))
    val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
    queries.join(corpus, Seq("cluster"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("adc", longDot(col("qc"), col("recon")))
      .withColumn("rn_c", row_number().over(wAdc))
      .filter(col("rn_c") <= candR)
      .withColumn("score", longDot(col("qc"), col("qc2")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
  }

  /** Exact-integer power iteration on a collected Gram matrix — the
    * driver half of the distributed PCA (q_embed_pca): the Gram of the
    * SQ8-quantized corpus is dims² longs of METADATA (the centroid-
    * collect rule), and the dominant-eigenvector iterate stays in
    * integers so any engine replays it bit-for-bit. Each round:
    * w = G·v (exact — |G| ≤ n·127², |v| ≤ 10⁶ keeps w < 2⁶³), then an
    * integer rescale v ← sign(w)·(|w| div d) with d = max|w| div 10⁶ + 1
    * — division by a PRECOMPUTED positive scalar with explicit sign
    * split, because trunc-vs-floor on negatives differs between
    * engines. No normalization sqrt ever happens: only the DIRECTION
    * survives, which is all a projection needs. */
  def powerIterate(g: Map[(Int, Int), Long], dims: Int, iters: Int): Array[Long] = {
    var v = Array.fill(dims)(1L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims) { i =>
        var acc = 0L
        var j = 0
        while (j < dims) { acc += g.getOrElse((i, j), 0L) * v(j); j += 1 }
        acc
      }
      val d = w.map(math.abs).max / 1000000L + 1L
      v = w.map(x => if (x >= 0) x / d else -((-x) / d))
    }
    v
  }

  /** Deterministic ±1 Johnson–Lindenstrauss projection matrix
    * (q_sim_rp): s(i,j) = +1 iff the first hex digit of
    * md5("rp:i:j") has even ASCII code — md5 is the codebase's
    * established cross-engine deterministic hash (q_fingerprint,
    * multimodal stand-ins), and per-cell hashing is what makes the
    * rows independent: cheap arithmetic rules (an affine-mod-97
    * threshold, chained LCGs over sequential seeds) produce rows that
    * are translates/correlates of one sequence and measured recall@50
    * of only 0.15-0.23 on the sf0.01 corpus — barely above the
    * 50/499 random floor — where this matrix measures 0.70, matching
    * a true-random draw (0.57). outDims rows of `dims` entries; a
    * driver-side constant (outDims·dims longs — metadata, never
    * data). */
  def rpMatrix(outDims: Int, dims: Int): Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(outDims, dims) { (i, j) =>
      md.reset()
      val h = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
      // first hex digit = high nibble of byte 0, rendered as a hex char
      val c = "0123456789abcdef".charAt((h(0) >> 4) & 0xf)
      if (c.toInt % 2 == 0) 1L else -1L
    }
  }

  /** RP-reduce an SQ8 code column to `outDims` exact-integer
    * coordinates: one codegen'd [[longDot]] against each matrix-row
    * literal — a narrow map, no shuffle; output bandwidth is
    * outDims/dims of the input's. */
  def rpProject(qc: Column, mat: Seq[Seq[Long]]): Column =
    array(mat.map(row => longDot(qc, typedLit(row))): _*)
}
