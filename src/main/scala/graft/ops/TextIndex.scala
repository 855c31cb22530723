package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the BM25 serving stack beside the
  * similarity-serving indexes ([[LshIndex]], [[IvfIndex]],
  * [[IvfPqIndex]]), under the same [[DeltaProtocol]] crash/replay
  * rules. [[graft.ops.Text.search]] recomputes the corpus token stream
  * per query (right for one-off analytics, wrong for a serving path —
  * at 100 TB every query would re-scan the corpus); this index pays
  * the tokenize + aggregate ONCE at build/append time and serves each
  * query from term-bucket-pruned postings reads.
  *
  * Layout under `dir`:
  * {{{
  *   postings/_tb=<b>/        (term, doc_id, tf, dl) for terms hashing to bucket b
  *   stats/                   1 row (t_total, n_docs) for the base segment
  *   postings_d<id>/_tb=<b>/  delta segment postings
  *   stats_d<id>/             delta segment stats (1 row)
  *   _INDEX, _DELTA_<id>      commit markers (DeltaProtocol)
  * }}}
  *
  * Design for the 100 TB shape:
  *
  *  - Postings are HASH-BUCKETED BY TERM into [[Buckets]] hive
  *    partitions, so a query's handful of terms prunes the read to
  *    ≤ |terms| directories per segment — the inverted-index seek,
  *    expressed as parquet partition pruning (the [[IvfPqIndex]]
  *    cluster-cut move, applied to text).
  *  - Each posting row DENORMALIZES the document length `dl` (the
  *    BM25 norm), the impact-ordered-postings trick: serving needs no
  *    join against a corpus-sized doc-length table — everything the
  *    score needs rides the pruned postings rows.
  *  - Corpus stats (t_total, n_docs) are 1-row per segment and SUM
  *    across segments, so the serve path reads segment-count rows of
  *    metadata, never re-aggregating the corpus.
  *  - df per query term is derived from the fetched postings by a
  *    window count — exact because (term, doc_id) is unique within a
  *    segment and doc_ids are APPEND-ONLY across segments (the corpus
  *    contract all the persisted indexes share; re-ingesting a doc_id
  *    means rebuild).
  *
  * The scoring math itself is [[Text.bm25Rank]] — the one shared copy —
  * so the served ranking is bit-identical to the token-stream path
  * (TextIndexSpec pins it; the q_text_search_served oracle replays the
  * full-corpus computation in DuckDB).
  */
object TextIndex {

  /** Term-hash partition count. At 100 TB scale with the bucket count
    * ∝ vocabulary so each bucket's postings stay file-sized; 64 keeps
    * fixture partitions non-trivial. Pinned at build time by the
    * layout — changing it means rebuild (same rule as
    * [[graft.cdc.FileGroups]] nBuckets). */
  val Buckets = 64

  /** The SAME codegen'd hash on writer and prober ([[graft.cdc.FileGroups]]
    * bucketCol rule: a driver-side reimplementation could drift). */
  private def termBucket(t: Column): Column =
    pmod(xxhash64(t), lit(Buckets.toLong))

  def exists(spark: SparkSession, dir: String): Boolean =
    DeltaProtocol.markerExists(spark, dir)

  def deltaIds(spark: SparkSession, dir: String): Seq[Long] =
    DeltaProtocol.deltaIds(spark, dir)

  /** One segment's build: tokenize once (cached for its three
    * consumers), write term-bucketed postings with dl denormalized in,
    * and the segment's 1-row stats. The tf⋈dl join is co-keyed on
    * doc_id — one hash exchange of vocabulary-sized aggregates, linear
    * in segment tokens. Returns false WITHOUT WRITING when the batch
    * tokenizes to zero tokens (all-null/empty/whitespace text): the
    * DeltaProtocol empty rule applies at the DERIVED-row level — a
    * zero-row partitioned write leaves a schema-less dir that fails
    * every later read (the LshIndex band guard's twin). */
  private def writeSegment(docs: DataFrame, idCol: String, textCol: String,
                           postDir: String, statDir: String): Boolean = {
    val toks = Text.tokenStream(docs, idCol, textCol).cache()
    try writeSegmentToks(toks, postDir, statDir)
    finally { toks.unpersist(); () }
  }

  /** The segment write over an already-cached token stream — split out
    * so [[build]]'s zero-token pre-check and the write share ONE
    * tokenization (the cached `toks` serves the emptiness probe and
    * the three aggregate consumers). */
  private def writeSegmentToks(toks: DataFrame, postDir: String, statDir: String): Boolean = {
    if (toks.isEmpty) false
    else {
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        tf.join(dl, "doc_id")
          .withColumn("_tb", termBucket(col("term")))
          .write.mode("overwrite").partitionBy("_tb").parquet(postDir)
        // id_lo/id_hi: the segment's doc_id range, so append's overlap
        // guard can clear disjoint batches from this 1-row read alone.
        // min/max OF THE CAST (not cast of the raw min/max): the guard
        // compares against the batch's cast range, and a lexicographic
        // min/max of string ids can invert under the cast — a false
        // negative that admits the exact duplicate the guard exists to
        // catch.
        toks.agg(count(lit(1)).as("t_total"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id").cast("long")).as("id_lo"),
            max(col("doc_id").cast("long")).as("id_hi"))
          .coalesce(1).write.mode("overwrite").parquet(statDir)
      true
    }
  }

  /** (Re)build the base index over a corpus. Rebuild-safe per the
    * delta protocol: commit marker dropped first, so a crash leaves an
    * uncommitted index, never a readable mismatch. A corpus with zero
    * tokens refuses loudly (there is nothing to index, and the base
    * segment dirs must exist for every later read) — and it refuses
    * BEFORE clearPriorIndex touches anything, so a bad rebuild against
    * an all-blank corpus leaves a previously healthy store committed
    * and readable instead of destroyed-and-uncommitted. */
  def build(spark: SparkSession, dir: String, docs: DataFrame,
            idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val toks = Text.tokenStream(docs, idCol, textCol).cache()
    try {
      // ONE tokenization serves the pre-check and the write: the cached
      // stream's limit-1 emptiness probe refuses BEFORE clearPriorIndex
      // touches anything, then feeds the segment aggregates
      require(!toks.isEmpty,
        s"TextIndex.build at $dir: the corpus tokenizes to zero tokens — nothing to " +
          "index (any existing index is left untouched)")
      DeltaProtocol.clearPriorIndex(spark, dir, Seq("postings", "stats"))
      writeSegmentToks(toks, s"$dir/postings", s"$dir/stats")
    } finally { toks.unpersist(); () }
    val out = DeltaProtocol.fsOf(spark, dir).create(DeltaProtocol.path(s"$dir/_INDEX"), true)
    out.close()
  }

  /** Append a document batch as delta `deltaId` — tokenize and
    * aggregate the BATCH only, never re-reading the landed corpus.
    * Exactly-once by the delta marker: a committed id is a no-op
    * (returns false); an empty batch commits a data-less marker.
    * Cost per batch ∝ batch tokens.
    *
    * ENFORCES the append-only doc_id contract it depends on: a
    * re-ingested doc_id would duplicate (term, doc_id) postings across
    * segments, silently inflating the window-count df and
    * double-scoring the doc in topK — so an overlapping batch FAILS
    * LOUDLY (rebuild to replace docs), mirroring DeltaProtocol's
    * fail-loud discipline. The guard is metadata-only for batches whose
    * doc_id range is disjoint from every landed segment's [id_lo,
    * id_hi] stats (the monotone-ingest common case); only
    * range-intersecting segments pay an exact column-pruned doc_id
    * semi-join. */
  def append(spark: SparkSession, dir: String, docs: DataFrame, deltaId: Long,
             idCol: String = "doc_id", textCol: String = "text"): Boolean = {
    require(exists(spark, dir), s"no committed text index at $dir — build first")
    if (deltaIds(spark, dir).contains(deltaId)) false
    else {
      if (DeltaProtocol.batchIsEmpty(docs))
        DeltaProtocol.commitDeltaMarker(spark, dir, deltaId, empty = true)
      else {
        assertNoDocOverlap(spark, dir, docs, idCol)
        // a batch with rows can still tokenize to ZERO tokens — it then
        // commits the data-less marker like an empty batch (writing a
        // zero-row segment would poison the read path)
        val wrote = writeSegment(docs, idCol, textCol,
          s"$dir/postings_d$deltaId", s"$dir/stats_d$deltaId")
        DeltaProtocol.commitDeltaMarker(spark, dir, deltaId, empty = !wrote)
      }
      true
    }
  }

  /** The overlap guard behind [[append]]. Long-keyed corpora (the
    * stats-range scope): a batch whose ids do not cast to long skips
    * the range cut and is checked exactly. Segments written before the
    * range stats existed (no id_lo column) are also checked exactly. */
  private def assertNoDocOverlap(spark: SparkSession, dir: String,
                                 docs: DataFrame, idCol: String): Unit = {
    val b = docs.agg(min(col(idCol).cast("long")).as("lo"),
      max(col(idCol).cast("long")).as("hi")).head()
    val range = if (b.isNullAt(0)) None else Some((b.getLong(0), b.getLong(1)))
    val segs = Seq(("postings", "stats")) ++
      DeltaProtocol.liveDeltaIds(spark, dir).map(i => (s"postings_d$i", s"stats_d$i"))
    val suspect = segs.filter { case (_, sd) =>
      val st = spark.read.parquet(s"$dir/$sd")
      if (!st.columns.contains("id_lo") || range.isEmpty) true
      else {
        val r = st.select(col("id_lo"), col("id_hi")).head()
        // an unusable range (null cast, or inverted — a pre-fix segment
        // whose stats were the cast of a LEXICOGRAPHIC min/max of
        // string ids) falls back to the exact check: the safe default
        // is "suspect", never "cleared"
        if (r.isNullAt(0) || r.isNullAt(1) || r.getLong(0) > r.getLong(1)) true
        else r.getLong(0) <= range.get._2 && range.get._1 <= r.getLong(1)
      }
    }.map(_._1)
    if (suspect.nonEmpty) {
      // per-segment reads (each _tb-partitioned dir is its own root —
      // a multi-path read trips partition-structure inference), doc_id
      // column only, unioned then probed
      val dup = suspect
        .map(p => spark.read.option("basePath", s"$dir/$p").parquet(s"$dir/$p")
          .select(col("doc_id")))
        .reduce(_ unionByName _).distinct()
        .join(docs.select(col(idCol).as("doc_id")).distinct(), "doc_id")
        .limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"TextIndex.append at $dir violates the append-only doc_id contract: " +
            s"doc_id ${dup.head.get(0)} is already indexed (segments checked: " +
            s"${suspect.mkString(", ")}) — re-ingesting a doc requires a rebuild")
    }
  }

  /** BM25 top-k serve from the persisted index: the query tokenizes
    * with the corpus rule, its term buckets are resolved by the
    * writer's hash, and each segment's postings read is partition-
    * pruned to exactly those buckets (`_tb` pushes into the scan as a
    * partition filter — the seek). df rides a term-window count over
    * the fetched postings; stats sum segment metadata rows. Work per
    * query ∝ the query terms' postings, never corpus size. */
  def topK(spark: SparkSession, dir: String, query: String, k: Int): DataFrame = {
    require(exists(spark, dir), s"no committed text index at $dir — build first")
    val ids = DeltaProtocol.liveDeltaIds(spark, dir)
    DeltaProtocol.requireDirs(spark, dir,
      Seq("postings", "stats") ++ ids.flatMap(i => Seq(s"postings_d$i", s"stats_d$i")),
      "text index")
    val qtoks = query.split(" ").filter(_.nonEmpty).distinct.toSeq
    import spark.implicits._
    val buckets = qtoks.toDF("term").select(termBucket(col("term")))
      .as[Long].collect().distinct.toSeq
    def seg(name: String): DataFrame =
      spark.read.option("basePath", s"$dir/$name").parquet(s"$dir/$name")
        .filter(col("_tb").isin(buckets: _*))
        .filter(col("term").isin(qtoks: _*))
    val posts = (Seq("postings") ++ ids.map(i => s"postings_d$i"))
      .map(seg).reduce(_ unionByName _)
    // project each segment to the two serve-side columns BEFORE the
    // union: segments built before the id_lo/id_hi range stats existed
    // carry 2 columns, newer ones 4 — a strict unionByName across the
    // mix would throw on exactly the legacy-segment case the overlap
    // guard supports
    val stats = (Seq("stats") ++ ids.map(i => s"stats_d$i"))
      .map(sd => spark.read.parquet(s"$dir/$sd")
        .select(col("t_total"), col("n_docs")))
      .reduce(_ unionByName _)
      .agg(sum(col("t_total")).cast("long").as("t_total"),
        sum(col("n_docs")).cast("long").as("n_docs"))
    val tf = posts
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .select(col("doc_id"), col("term"), col("df"), col("tf"), col("dl"))
    Text.bm25Rank(tf, stats, k)
  }
}
