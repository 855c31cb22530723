package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF∘PQ index — the FAISS `IVFPQ,Refine` layout as tables:
  * the build/serve split of [[Vectors.ivfPqSearch]], writing the
  * trained artifacts once and answering queries from the stored layout
  * without touching the raw corpus (or even the full code list) again.
  *
  * Layout under `dir`:
  * {{{
  *   centroids/            (c_id, cv) — k rows (coarse quantizer)
  *   codebook/             (mm, cw_id, sub) — m·ncw rows (PQ metadata)
  *   codes/cluster=<c>/    (vec_id, pq) — m SMALL codes per vector:
  *                         the ADC scan table, ~m bytes/vector at
  *                         ncw ≤ 256 (16× under float32)
  *   refine/cluster=<c>/   (vec_id, qc) — exact SQ8 codes, fetched
  *                         only for ADC survivors (candR rows/query)
  *   codes_d<id>/ refine_d<id>/  appended batches (deltas)
  *   _DELTA_<id>           append marker (written last, AFTER both)
  *   _INDEX                commit marker (written last)
  * }}}
  *
  * Both data tables are hive-partitioned BY CLUSTER, so a query's
  * probed clusters become directory-pruned reads on BOTH tiers:
  * ADC cost ∝ probed-partition CODE bytes (m/vector), refine cost ∝
  * candR·dim bytes per query — never corpus bytes. The probed-cluster
  * list and the codebook are driver-side metadata (≤ k and m·ncw rows
  * respectively — the [[Vectors.assignTopN]] bounded-collect rule).
  * Reconstruction happens at SERVE time from the stored small codes +
  * codebook literals ([[Vectors.pqRecon]] map lookups), exactly like a
  * production index that ships codes, not reconstructions.
  *
  * All scoring is integer after the coarse assign (ADC and re-rank are
  * [[graft.functions.LongDot]] over bigint codes), so the served
  * answers are bit-identical to the in-memory [[Vectors.ivfPqSearch]]
  * over the same persisted centroids — OpsSpec pins the equality, and
  * q_sim_ivf_pq_served value-checks the whole lifecycle against the
  * same DuckDB oracle shape as q_sim_ivf_pq.
  */
object IvfPqIndex {
  import DeltaProtocol.{fsOf, path}

  def exists(spark: SparkSession, dir: String): Boolean =
    DeltaProtocol.markerExists(spark, dir)

  /** Corpus rows → (vec_id, cluster, qc) under the given centroids:
    * narrow centroid-literal assign + unit-sphere SQ8 encode. */
  private def coded(emb: DataFrame, idCol: String, vecCol: String,
                    cents: DataFrame): DataFrame =
    Vectors.assignToCentroids(emb, idCol, vecCol, cents)
      .withColumn("qc", Vectors.sq8(col("v"), col("nrm")))
      .select(col("vec_id"), col("cluster"), col("qc"))

  /** Read the persisted codebook back into the driver-side literal form
    * every encode/recon call takes (m·ncw rows — index metadata). */
  def readCodebook(sess: SparkSession, dir: String): Seq[Seq[(Long, Seq[Long])]] = {
    val rows = sess.read.parquet(s"$dir/codebook")
      .select(col("mm").cast("int"), col("cw_id").cast("long"), col("sub"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
    require(rows.nonEmpty, s"empty codebook at $dir/codebook")
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, sub) =>
      sub.sortBy(_._2).map { case (_, cwId, s) => (cwId, s) }.toSeq
    }
  }

  /** Train and persist: coarse centroids (spherical k-means), PQ
    * codebook (first-`ncw`-by-id sample — the deterministic, oracle-
    * replayable init — or, with `cbIters > 0`, the per-subspace
    * Lloyd-trained refinement of it, [[Vectors.pqCodebookTrained]]:
    * the recall dial measured +0.02 overlap@5 on the fixture, paid
    * once per index BUILD, never at serve time), then the two
    * cluster-partitioned tables; commit marker last. A rebuild drops
    * the marker FIRST and clears every prior delta, committed or
    * orphaned — a delta encoded under the OLD centroids/codebook would
    * silently corrupt serving (the [[IvfIndex.build]] rule, extended
    * to the codebook). Streaming deltas ([[appendDelta]]) encode under
    * the PERSISTED codebook whichever way it was trained — the read
    * path is identical. */
  def build(sess: SparkSession, dir: String, emb: DataFrame,
            idCol: String, vecCol: String, k: Int, iters: Int,
            m: Int, ncw: Int, cbIters: Int = 0): Unit = {
    DeltaProtocol.clearPriorIndex(sess, dir, Seq("codes_d", "refine_d"))
    Vectors.kmeans(emb, idCol, vecCol, k, iters)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val cents = sess.read.parquet(s"$dir/centroids")
    // materialized ONCE (localCheckpoint, disk-backed): the codebook
    // sample and BOTH tier writes consume the assigned+encoded corpus —
    // without it the assign+SQ8 pipeline runs three times, and a
    // non-deterministic input could hand the codes and refine tiers
    // DIFFERENT row sets, whose mismatch the serve-path inner join
    // would turn into silently vanished ADC survivors
    val c = coded(emb, idCol, vecCol, cents).localCheckpoint()
    val cb = Vectors.pqCodebookTrained(c, "vec_id", "qc", m, ncw, cbIters)
    val cbRows = cb.zipWithIndex.flatMap { case (sub, mm) =>
      sub.map { case (cwId, s) => (mm, cwId, s) }
    }
    import sess.implicits._
    cbRows.toDF("mm", "cw_id", "sub")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/codebook")
    writeTier(c, cb, s"$dir/codes", s"$dir/refine")
    fsOf(sess, dir).createNewFile(path(s"$dir/_INDEX"))
  }

  /** Write one (codes, refine) pair from coded rows: codes carry the m
    * small PQ ids ([[graft.functions.PqEncode.codes]] — the constant-
    * size codegen kernel), refine carries the exact SQ8 code. Callers
    * pass a MATERIALIZED (localCheckpoint'd) frame: the two writes must
    * see the same rows — tier coherence — and must not re-run the
    * encode. */
  private def writeTier(c: DataFrame, cb: Seq[Seq[(Long, Seq[Long])]],
                        codesDir: String, refineDir: String): Unit = {
    val cbSubs = cb.map(_.map(_._2))
    c.select(col("cluster"), col("vec_id"),
        graft.functions.PqEncode.codes(col("qc"), cbSubs).as("pq"))
      .write.mode("overwrite").partitionBy("cluster").parquet(codesDir)
    c.select(col("cluster"), col("vec_id"), col("qc"))
      .write.mode("overwrite").partitionBy("cluster").parquet(refineDir)
  }

  /** Committed delta ids, sorted. */
  def deltaIds(sess: SparkSession, dir: String): Seq[Long] =
    DeltaProtocol.deltaIds(sess, dir)

  /** Append a batch as delta `id`: assign + encode under the FIXED
    * persisted centroids and codebook (immutable between rebuilds),
    * write BOTH tier dirs, marker last — a crash between the writes
    * leaves an uncommitted, invisible delta. Replaying a committed id
    * is a no-op (streaming replay safety). An EMPTY batch commits its
    * marker with the `empty` content and no data dirs (an empty
    * partitioned write leaves a schema-less dir that would fail every
    * later serve read); readers skip exactly those deltas and fail
    * loudly if a LIVE delta's dirs are lost. Per-batch cost is the
    * narrow encode of the batch itself. */
  def append(sess: SparkSession, dir: String, emb: DataFrame,
             idCol: String, vecCol: String, id: Long): Boolean = {
    require(exists(sess, dir), s"no committed IVF-PQ index at $dir")
    if (deltaIds(sess, dir).contains(id)) false
    else {
      val empty = DeltaProtocol.batchIsEmpty(emb)
      if (!empty) {
        val cents = sess.read.parquet(s"$dir/centroids")
        val cb = readCodebook(sess, dir)
        // batch-sized materialization (the writeTier coherence rule)
        writeTier(coded(emb, idCol, vecCol, cents).localCheckpoint(), cb,
          s"$dir/codes_d$id", s"$dir/refine_d$id")
      }
      DeltaProtocol.commitDeltaMarker(sess, dir, id, empty)
      true
    }
  }

  private def unionPruned(sess: SparkSession, dirs: Seq[String],
                          probed: Seq[Long]): DataFrame =
    dirs.map(d => sess.read.parquet(d).filter(col("cluster").isin(probed: _*)))
      .reduce(_.unionByName(_))

  /** Serve: ADC over the probed clusters' stored code lists, exact
    * re-rank of the `candR` survivors from the refine tier, top-`k`
    * out — (vec_id, rn, nn_id, score), bit-identical to
    * [[Vectors.ivfPqSearch]] over the same centroids. Queries are any
    * (id, vector) DataFrame; self-hits are excluded by id. */
  def topK(sess: SparkSession, dir: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, nprobe: Int,
           candR: Int): DataFrame = {
    require(exists(sess, dir), s"no committed IVF-PQ index at $dir")
    val cents = sess.read.parquet(s"$dir/centroids")
    val cb = readCodebook(sess, dir)
    val m = cb.length
    // materialized ONCE (localCheckpoint): the probed-cluster collect
    // below and the codes join both consume the assigned+encoded query
    // side — without the checkpoint the narrow argmax + SQ8 encode (and
    // the query scan) run twice per serve call. Encoded queries are
    // small (cluster + id + dim longs per probe), so the eager
    // materialization is batch-sized, never corpus-sized.
    val q = Vectors.assignTopN(queries, idCol, vecCol, cents, nprobe)
      .withColumn("qc", Vectors.sq8(col("v"), col("nrm")))
      .select(col("cluster"), col("vec_id"), col("qc"))
      .localCheckpoint()
    // ≤ k·nprobe distinct cluster ids whatever the query count —
    // metadata, not data; drives directory pruning on BOTH tiers
    val probed = q.select(col("cluster")).distinct().collect().map(_.getLong(0)).toSeq
    // only deltas that carry data; a LIVE delta (or the base) with a
    // lost dir fails loudly — both tiers must be present together, or
    // ADC candidates would vanish at the refine join
    val ids = DeltaProtocol.liveDeltaIds(sess, dir)
    DeltaProtocol.requireDirs(sess, dir,
      Seq("codes", "refine") ++ ids.flatMap(i => Seq(s"codes_d$i", s"refine_d$i")),
      "IVF-PQ index")
    val codes = unionPruned(sess,
        s"$dir/codes" +: ids.map(i => s"$dir/codes_d$i"), probed)
      .select(col("cluster").cast("long").as("cluster"),
        col("vec_id").as("nn_id"),
        // reconstruct at serve time from the stored small codes — the
        // index ships m bytes/vector, not reconstructions
        Vectors.pqRecon(
          (0 until m).map(i => element_at(col("pq"), i + 1)), cb).as("recon"))
    val refine = unionPruned(sess,
        s"$dir/refine" +: ids.map(i => s"$dir/refine_d$i"), probed)
      .select(col("cluster").cast("long").as("cluster"),
        col("vec_id").as("nn_id"), col("qc").as("qc2"))
    val wAdc = Window.partitionBy(col("vec_id")).orderBy(col("adc").desc, col("nn_id"))
    val wTop = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("nn_id"))
    q.join(codes, Seq("cluster"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("adc", Vectors.longDot(col("qc"), col("recon")))
      .withColumn("rn_c", row_number().over(wAdc))
      .filter(col("rn_c") <= candR)
      // refine fetch: candR rows per query meet the pruned exact-code
      // tier on (cluster, nn_id) — the survivors' side is tiny, so the
      // planner broadcasts it onto the refine scan
      .select(col("cluster"), col("vec_id"), col("qc"), col("nn_id"))
      .join(refine, Seq("cluster", "nn_id"))
      .withColumn("score", Vectors.longDot(col("qc"), col("qc2")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), col("score"))
  }
}
