package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build/serve split a real ANN deployment
  * runs: train once, write the index as tables, answer queries from
  * the stored layout without touching the raw corpus again.
  *
  * Layout under `dir`:
  * {{{
  *   centroids/            (c_id, cv) — k rows
  *   corpus/cluster=<c>/   assigned vectors, partitioned by cluster
  *   corpus_d<id>/         appended batches (delta, one dir per id)
  *   _DELTA_<id>           append marker (written last)
  *   _INDEX                marker (written last)
  * }}}
  *
  * The corpus is hive-partitioned BY CLUSTER, so a query's probed
  * clusters become directory-pruned reads: serving cost is
  * ∝ probed-partition bytes, never corpus bytes. The probed-cluster
  * list is a ≤k-element driver collect (index metadata, bounded by the
  * centroid count regardless of query-batch size). Same window top-k
  * shape as [[Vectors.ivfTopK]]; recall characteristics are identical
  * because the assignment is identical (floats round-trip parquet
  * bit-exactly).
  */
object IvfIndex {
  import DeltaProtocol.{fsOf, path}

  def exists(spark: SparkSession, dir: String): Boolean =
    DeltaProtocol.markerExists(spark, dir)

  /** Train (spherical k-means) and persist the index: centroids first,
    * then the cluster-partitioned corpus assignment, marker last (the
    * usual data-then-marker crash rule). A rebuild also clears every
    * prior delta, committed or crash-orphaned, markers first — a delta
    * from the previous index generation carries assignments under the
    * OLD centroids and would silently corrupt serving (the LshIndex
    * rebuild rule, applied to its sibling). */
  def build(sess: SparkSession, dir: String, emb: DataFrame,
            idCol: String, vecCol: String, k: Int, iters: Int): Unit = {
    // a rebuild drops the marker FIRST: a crash mid-rewrite must leave
    // an uncommitted index, never a readable centroids/corpus mismatch
    DeltaProtocol.clearPriorIndex(sess, dir, Seq("corpus_d"))
    Vectors.kmeans(emb, idCol, vecCol, k, iters)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val cents = sess.read.parquet(s"$dir/centroids")
    Vectors.assignToCentroids(emb, idCol, vecCol, cents)
      .select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/corpus")
    fsOf(sess, dir).createNewFile(path(s"$dir/_INDEX"))
  }

  /** Committed delta ids, sorted. */
  def deltaIds(sess: SparkSession, dir: String): Seq[Long] =
    DeltaProtocol.deltaIds(sess, dir)

  /** Append a vector batch as delta `id` — the daily-ingest path: new
    * vectors are assigned to the FIXED trained centroids (an IVF
    * index's centroids are immutable between rebuilds; appending never
    * moves them, it only files new members) and written
    * cluster-partitioned under `corpus_d<id>/`, marker last. A
    * committed id is a no-op (streaming replay safety); an unmarked
    * dir from a crashed append is invisible to serving. Per-batch cost
    * is the narrow assignment of the batch itself — the indexed corpus
    * is never re-read. */
  def append(sess: SparkSession, dir: String, emb: DataFrame,
             idCol: String, vecCol: String, id: Long): Boolean = {
    require(exists(sess, dir), s"no committed IVF index at $dir")
    if (deltaIds(sess, dir).contains(id)) false
    else {
      // empty batch: `empty` marker only — an empty partitioned write
      // leaves a schema-less dir that poisons every later serve read
      val empty = DeltaProtocol.batchIsEmpty(emb)
      if (!empty) {
        val cents = sess.read.parquet(s"$dir/centroids")
        Vectors.assignToCentroids(emb, idCol, vecCol, cents)
          .select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/corpus_d$id")
      }
      DeltaProtocol.commitDeltaMarker(sess, dir, id, empty)
      true
    }
  }

  /** Exact top-k within the `nprobe` nearest clusters of each query,
    * served from the persisted layout. Queries are any (id, vector)
    * DataFrame — they need not come from the indexed corpus; self-hits
    * (same id) are excluded as in [[Vectors.bruteForceTopK]]. */
  def topK(sess: SparkSession, dir: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    require(exists(sess, dir), s"no committed IVF index at $dir")
    val cents = sess.read.parquet(s"$dir/centroids")
    // materialized ONCE (localCheckpoint): the probed-cluster collect
    // and the corpus join both consume the assigned query side —
    // without it the narrow argmax (and the query scan) run twice per
    // serve call. Batch-sized, never corpus-sized (the IvfPqIndex.topK
    // rule).
    val q = Vectors.assignTopN(queries, idCol, vecCol, cents, nprobe)
      .select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    // ≤ k distinct cluster ids whatever the query count — index
    // metadata, not data
    val probed = q.select(col("cluster")).distinct()
      .collect().map(_.getLong(0))
    // base plus every LIVE delta (an empty-batch delta's marker says
    // `empty` and is skipped; a live delta with a lost dir fails
    // loudly), each a partition-pruned scan
    val ids = DeltaProtocol.liveDeltaIds(sess, dir)
    DeltaProtocol.requireDirs(sess, dir,
      "corpus" +: ids.map(i => s"corpus_d$i"), "IVF index")
    val dirs = s"$dir/corpus" +: ids.map(id => s"$dir/corpus_d$id")
    val corpus = dirs
      .map(d => sess.read.parquet(d).filter(col("cluster").isin(probed: _*)))
      .reduce(_.unionByName(_))
      .select(col("cluster").cast("long").as("cluster"), col("vec_id").as("nn_id"),
        col("v").as("v2"), col("nrm").as("nrm2"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
    q.join(corpus, Seq("cluster"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", Vectors.cosine(col("v"), col("v2"), col("nrm"), col("nrm2")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("nn_id"), round(col("cos"), 4).as("cos"))
  }
}
