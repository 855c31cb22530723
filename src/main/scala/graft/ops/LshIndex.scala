package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index — the build/serve split that makes
  * near-dup detection INCREMENTAL: index the corpus once, then dedup
  * each incoming batch against the index by reading only the band
  * buckets the batch's signatures hash into, never rescanning (or
  * re-pairing) the historical corpus.
  *
  * This is the daily-ingest shape of the q_dedup_minhash pipeline: at
  * 100 TB the full-corpus pair generation is a once-ever build cost;
  * per-batch dedup must be ∝ batch size + touched-bucket bytes. The
  * reference's pipeline (CDC batches landing forever,
  * README.md:170-204) meets training-data curation exactly here — every
  * landed batch asks "which of these documents do we already have?"
  *
  * Layout under `dir`:
  * {{{
  *   bands/bucket=<b>/        (band, doc_id, sh) for the base corpus
  *   bands_d<id>/bucket=<b>/  appended batches (delta, one dir per id)
  *   _DELTA_<id>              append marker (written last)
  *   _INDEX                   base marker, carries "nbuckets=<n>"
  * }}}
  *
  * The bucket is a stable hash of the band string modulo a fixed
  * nBuckets (pinned in `_INDEX` — a rehash would strand every existing
  * row). A probe batch's distinct buckets are a ≤nBuckets-long driver
  * collect (index metadata, not data); the index scan prunes to those
  * hive partitions. Appends follow the delta+marker crash rule: a
  * killed append leaves an unmarked dir that readers never resolve, and
  * re-appending a committed id is a no-op (streaming replay safety).
  *
  * Signature parameters are fixed to the q_dedup_minhash contract
  * (2-gram shingles, 6 minhash slots, 3 bands of 2) so index matches
  * are oracle-replayable in DuckDB.
  */
object LshIndex {

  import DeltaProtocol.{fsOf, path}

  def exists(spark: SparkSession, dir: String): Boolean =
    DeltaProtocol.markerExists(spark, dir)

  /** (doc_id, sh, band): distinct 2-gram shingle set + one row per LSH
    * band of the 6-slot MinHash signature. Shared by the index writer,
    * the probe side, and q_dedup_minhash — band semantics are defined
    * once. The shingle set rides along so the exact-Jaccard verify
    * never rescans text. */
  def bands(docs: DataFrame): DataFrame =
    docs.filter(size(split(col("text"), " ")) >= 2)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), array_distinct(Text.shingles(col("toks"), 2)).as("sh"))
      .withColumn("md5s", transform(col("sh"), x => md5(x)))
      .withColumn("sig", Text.minhashSignatureFromMd5s(col("md5s"), 6))
      .select(col("doc_id"), col("sh"),
        explode_outer(Text.lshBands(col("sig"), 3, 2)).as("band"))
      .filter(col("band").isNotNull)

  private def bucketCol(nBuckets: Int) = pmod(xxhash64(col("band")), lit(nBuckets.toLong))

  private def nBucketsOf(spark: SparkSession, dir: String): Int = {
    val fs = fsOf(spark, dir)
    val in = fs.open(path(s"$dir/_INDEX"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.trim.stripPrefix("nbuckets=").toInt
  }

  /** Index the base corpus: band rows bucket-partitioned, marker last
    * (with nBuckets pinned inside it). A rebuild drops the marker first
    * so a crash mid-rewrite leaves an uncommitted index, never a
    * half-rewritten readable one — and it removes every prior delta
    * (markers first, then dirs): a delta from the previous index
    * generation would otherwise resurface docs the new corpus no longer
    * contains, or — under a different nBuckets — carry bucket values
    * from the old modulus that the probe's `isin` filter silently
    * drops, i.e. missed duplicates. */
  def build(sess: SparkSession, dir: String, docs: DataFrame, nBuckets: Int = 16): Unit = {
    clearPriorIndex(sess, dir)
    // the guard is on the BAND rows, not the input docs: bands() drops
    // sub-2-token documents, so a non-empty corpus of short docs still
    // yields zero rows, and an empty partitioned write would leave a
    // schema-less bands/ that poisons every later probe. A band-less
    // base commits with no bands/ dir (the buildEmpty state).
    val b = bands(docs).withColumn("bucket", bucketCol(nBuckets))
    if (DeltaProtocol.batchIsEmpty(b)) fsOf(sess, dir).delete(path(s"$dir/bands"), true)
    else b.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands")
    commitMarker(sess, dir, nBuckets)
  }

  /** Commit an index over an EMPTY base corpus — the streaming-ingest
    * bootstrap ([[graft.streaming.Streams.nearDupIngest]]): initialize
    * once, then every micro-batch enters through the append path and
    * the delta protocol's replay rules apply uniformly from batch 0
    * (a special-cased "first batch builds the base" would re-dedup the
    * bootstrap batch against itself on crash replay). */
  def buildEmpty(sess: SparkSession, dir: String, nBuckets: Int = 16): Unit = {
    clearPriorIndex(sess, dir)
    fsOf(sess, dir).delete(path(s"$dir/bands"), true)
    commitMarker(sess, dir, nBuckets)
  }

  // markers first so no reader resolves a delta whose dir is
  // mid-delete — the shared DeltaProtocol rule
  private def clearPriorIndex(sess: SparkSession, dir: String): Unit =
    DeltaProtocol.clearPriorIndex(sess, dir, Seq("bands_d"))

  private def commitMarker(sess: SparkSession, dir: String, nBuckets: Int): Unit = {
    // atomic (tmp + rename), like the sketch stores' geometry markers:
    // create-then-write would expose a zero-length _INDEX — the index
    // reads as committed but nBucketsOf throws on every later call
    fsOf(sess, dir).mkdirs(path(dir))
    DeltaProtocol.writeFileAtomic(sess, s"$dir/_INDEX", s"nbuckets=$nBuckets")
  }

  /** Committed delta ids, sorted. */
  def deltaIds(spark: SparkSession, dir: String): Seq[Long] =
    DeltaProtocol.deltaIds(spark, dir)

  /** Append a batch's band rows as delta `id` — dir first, marker last;
    * an already-committed id is a no-op (replay idempotence). Returns
    * whether the delta was written. */
  def append(sess: SparkSession, dir: String, docs: DataFrame, id: Long): Boolean = {
    require(exists(sess, dir), s"no committed LSH index at $dir")
    if (deltaIds(sess, dir).contains(id)) false
    else {
      // the emptiness guard is on the BAND rows, not the input batch:
      // bands() drops sub-2-token docs, so a non-empty batch can still
      // produce zero band rows, and the empty partitioned write would
      // leave a schema-less dir that poisons every later probe read.
      // A band-less batch commits an `empty` marker only.
      val b = bands(docs).withColumn("bucket", bucketCol(nBucketsOf(sess, dir)))
      val empty = DeltaProtocol.batchIsEmpty(b)
      if (!empty)
        b.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands_d$id")
      DeltaProtocol.commitDeltaMarker(sess, dir, id, empty)
      true
    }
  }

  /** The indexed band rows restricted to `buckets` — base (when one
    * exists; a [[buildEmpty]] index has none) plus every committed
    * delta, each a partition-pruned scan. */
  private def readBands(sess: SparkSession, dir: String, buckets: Seq[Long]): DataFrame = {
    // base is OPTIONAL (buildEmpty and band-less builds commit without
    // one); deltas are skipped only when their marker says `empty`, and
    // a live delta with a lost dir fails loudly
    val ids = DeltaProtocol.liveDeltaIds(sess, dir)
    DeltaProtocol.requireDirs(sess, dir, ids.map(i => s"bands_d$i"), "LSH index")
    val base = if (fsOf(sess, dir).exists(path(s"$dir/bands"))) Seq(s"$dir/bands") else Nil
    val dirs = base ++ ids.map(id => s"$dir/bands_d$id")
    if (dirs.isEmpty)
      sess.createDataFrame(sess.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sh",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
          org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType))))
    else dirs.map(d => sess.read.parquet(d).filter(col("bucket").isin(buckets: _*)))
      .reduce(_.unionByName(_))
  }

  /** Near-dup matches of `batch` (doc_id, text) against the INDEXED
    * corpus: (corpus_id, new_id, jac) with exact Jaccard ≥ `minJac`,
    * deduped across bands. Reads only the band buckets the batch
    * probes; per-batch cost is ∝ batch bands + touched-bucket bytes.
    * Self-matches (a batch doc already indexed under the same id) are
    * excluded. */
  def matches(sess: SparkSession, dir: String, batch: DataFrame,
              minJac: Double = 0.5): DataFrame = {
    require(exists(sess, dir), s"no committed LSH index at $dir")
    val nb = nBucketsOf(sess, dir)
    // the band pipeline (tokenize → shingle → md5 → minhash, interpreted
    // higher-order exprs — the expensive part of a probe) has TWO
    // consumers: the driver-side bucket collect and the index join.
    // localCheckpoint materializes it exactly once; unlike persist() it
    // isn't pinned in the CacheManager, so the blocks are released when
    // the plan is garbage-collected — the right lifetime for a library
    // call that can't know when its caller is done with the result.
    val probe = bands(batch)
      .select(col("doc_id").as("new_id"), col("sh").as("shb"), col("band"),
        bucketCol(nb).as("bucket"))
      .localCheckpoint()
    // distinct probed buckets: a ≤nBuckets driver collect — index
    // metadata, bounded regardless of batch size
    val buckets = probe.select(col("bucket")).distinct().collect().map(_.getLong(0)).toSeq
    val idx = readBands(sess, dir, buckets)
      .select(col("doc_id").as("corpus_id"), col("sh").as("sha"), col("band"))
    probe.join(idx, Seq("band"))
      .filter(col("corpus_id") =!= col("new_id"))
      .select(col("corpus_id"), col("new_id"),
        Text.jaccard(col("sha"), col("shb")).as("jac"))
      .filter(col("jac") >= minJac)
      .distinct()
  }
}
