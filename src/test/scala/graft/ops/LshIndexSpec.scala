package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Persisted LSH dedup index: serving from the bucket-partitioned
  * layout must equal the direct (unindexed) band join, probes must
  * prune to their buckets, and appends must follow the delta+marker
  * replay rules. */
class LshIndexSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs() = Tables.documents(spark, sf)

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"corpus_id", $"new_id", $"jac")
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq

  test("index matches equal the direct band-join computation bit-for-bit") {
    val dir = tmpDir("graft_lsh") + "/idx"
    val corpus = docs().filter(pmod($"doc_id", lit(5)) =!= 0)
    val batch = docs().filter(pmod($"doc_id", lit(5)) === 0)
    LshIndex.build(spark, dir, corpus, nBuckets = 8)

    val got = canon(LshIndex.matches(spark, dir, batch))
    val direct = canon(
      LshIndex.bands(batch).select($"doc_id".as("new_id"), $"sh".as("shb"), $"band")
        .join(LshIndex.bands(corpus).select($"doc_id".as("corpus_id"), $"sh".as("sha"), $"band"),
          Seq("band"))
        .select($"corpus_id", $"new_id", Text.jaccard($"sha", $"shb").as("jac"))
        .filter($"jac" >= 0.5).distinct())
    assert(got.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(got == direct)
  }

  test("a small probe reads only its band buckets, not the whole index") {
    val dir = tmpDir("graft_lsh2") + "/idx"
    LshIndex.build(spark, dir, docs(), nBuckets = 16)
    val totalBuckets = spark.read.parquet(s"$dir/bands")
      .select($"bucket").distinct().count()
    // one doc probes ≤3 bands → ≤3 buckets; the bucket filter must sit
    // at PARTITION level (directory pruning before IO), not post-scan
    val one = docs().orderBy($"doc_id").limit(1)
    val m = LshIndex.matches(spark, dir, one)
    val plan = m.queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("/bands")).toSeq
    assert(scans.nonEmpty, plan)
    assert(scans.forall(l => !l.contains("PartitionFilters: []")),
      s"band-bucket filter not pushed to partition pruning:\n$plan")
    // and the rows that survive come from ≤3 bucket dirs
    val bucketsRead = m.sparkSession.read.parquet(s"$dir/bands")
      .filter($"bucket".isin(LshIndex.bands(one)
        .select(pmod(xxhash64($"band"), lit(16L)).as("b"))
        .distinct().as[Long].collect().toSeq: _*))
      .select(input_file_name()).distinct().collect()
      .flatMap(r => "bucket=(\\d+)".r.findFirstMatchIn(r.getString(0)).map(_.group(1)))
      .distinct
    assert(bucketsRead.nonEmpty && bucketsRead.length <= 3,
      s"1-doc probe touched ${bucketsRead.length} of $totalBuckets buckets")
    assert(totalBuckets > 3, "fixture too small to demonstrate pruning")
  }

  test("append: delta rows serve; replaying a committed id is a no-op; unmarked dirs are invisible") {
    val root = tmpDir("graft_lsh3")
    val dir = root + "/idx"
    val corpus = docs().filter($"doc_id" < 20)
    LshIndex.build(spark, dir, corpus, nBuckets = 8)

    // append a doc identical to a known corpus doc's text under a new id
    val donor = docs().filter($"doc_id" === 30).select($"text").as[String].head()
    val appended = Seq((1000L, donor)).toDF("doc_id", "text")
    assert(LshIndex.append(spark, dir, appended, 0L))
    assert(!LshIndex.append(spark, dir, appended, 0L)) // replay no-op

    // a batch equal to the appended text matches it at jac 1.0
    val probe = Seq((2000L, donor)).toDF("doc_id", "text")
    val got = canon(LshIndex.matches(spark, dir, probe))
    assert(got.contains((1000L, 2000L, 1.0)))

    // crash-shaped delta: dir without marker is never read
    LshIndex.bands(Seq((3000L, donor)).toDF("doc_id", "text"))
      .withColumn("bucket", pmod(xxhash64($"band"), lit(8L)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/bands_d7")
    val after = canon(LshIndex.matches(spark, dir, probe))
    assert(!after.exists(_._1 == 3000L), "unmarked delta dir must be invisible")
  }

  test("rebuild clears prior deltas: removed docs do not resurface (same nBuckets)") {
    val dir = tmpDir("graft_lsh4") + "/idx"
    val corpus = docs().filter($"doc_id" < 20)
    val donor = docs().filter($"doc_id" === 30).select($"text").as[String].head()
    LshIndex.build(spark, dir, corpus, nBuckets = 8)
    assert(LshIndex.append(spark, dir, Seq((1000L, donor)).toDF("doc_id", "text"), 0L))

    val probe = Seq((2000L, donor)).toDF("doc_id", "text")
    assert(canon(LshIndex.matches(spark, dir, probe)).contains((1000L, 2000L, 1.0)))

    // rebuild over the same corpus, same nBuckets: doc 1000 lived only
    // in a delta of the previous index generation and must be gone
    LshIndex.build(spark, dir, corpus, nBuckets = 8)
    assert(LshIndex.deltaIds(spark, dir).isEmpty, "rebuild must drop committed delta markers")
    val after = canon(LshIndex.matches(spark, dir, probe))
    assert(!after.exists(_._1 == 1000L), s"stale delta doc resurfaced after rebuild: $after")
  }

  test("rebuild frees delta ids: a replayed batch re-indexes under the new modulus") {
    val dir = tmpDir("graft_lsh5") + "/idx"
    val corpus = docs().filter($"doc_id" < 20)
    val donor = docs().filter($"doc_id" === 30).select($"text").as[String].head()
    LshIndex.build(spark, dir, corpus, nBuckets = 8)
    assert(LshIndex.append(spark, dir, Seq((1000L, donor)).toDF("doc_id", "text"), 0L))

    // rebuild under a DIFFERENT modulus. Before the fix, the stale
    // _DELTA_0 marker survived: the replayed append(id=0) below was a
    // no-op, while the stale delta's bucket values (old modulus) fail
    // the probe's isin filter — doc 1000 silently unfindable = missed
    // duplicates. After the fix the id is free and the batch re-indexes.
    LshIndex.build(spark, dir, corpus, nBuckets = 5)
    assert(LshIndex.append(spark, dir, Seq((1000L, donor)).toDF("doc_id", "text"), 0L),
      "rebuild must free previously committed delta ids for replay")
    val got = canon(LshIndex.matches(spark, dir, Seq((2000L, donor)).toDF("doc_id", "text")))
    assert(got.contains((1000L, 2000L, 1.0)), s"re-appended doc must match: $got")
  }

  test("matches() computes the probe band pipeline once (checkpointed, no batch rescan)") {
    val dir = tmpDir("graft_lsh6") + "/idx"
    LshIndex.build(spark, dir, docs(), nBuckets = 8)
    val batch = docs().filter(pmod($"doc_id", lit(5)) === 0)
    val m = LshIndex.matches(spark, dir, batch)
    val plan = m.queryExecution.executedPlan.toString
    // probe side must come from the materialized checkpoint, and every
    // file scan in the plan must be an index bands dir — a documents
    // scan here means the expensive shingle/minhash pipeline ran twice
    assert(plan.contains("ExistingRDD"), plan)
    val fileScans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(fileScans.nonEmpty && fileScans.forall(_.contains("/bands")),
      s"probe batch rescanned from source:\n$plan")
  }

  test("nBuckets is the corpus-scale dial: pruning holds at 256 buckets") {
    // at corpus scale nBuckets must grow (thousands) or a batch probes
    // every bucket and "read only touched buckets" degrades to a full
    // index scan; the pinned-modulus layout supports any build-time
    // value — prove pruning + the bounded driver collect hold at 256
    val dir = tmpDir("graft_lsh7") + "/idx"
    LshIndex.build(spark, dir, docs(), nBuckets = 256)
    val one = docs().orderBy($"doc_id").limit(1)
    val probedBuckets = LshIndex.bands(one)
      .select(pmod(xxhash64($"band"), lit(256L)).as("b"))
      .distinct().as[Long].collect().toSeq
    assert(probedBuckets.nonEmpty && probedBuckets.length <= 3) // ≤3 bands per doc
    val m = LshIndex.matches(spark, dir, one)
    val plan = m.queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("/bands")).toSeq
    assert(scans.nonEmpty && scans.forall(l => !l.contains("PartitionFilters: []")),
      s"bucket filter not pushed to partition pruning at 256 buckets:\n$plan")
    // the probe reads only its own bucket dirs, not the other ~250
    val bucketsRead = spark.read.parquet(s"$dir/bands")
      .filter($"bucket".isin(probedBuckets: _*))
      .select(input_file_name()).distinct().collect()
      .flatMap(r => "bucket=(\\d+)".r.findFirstMatchIn(r.getString(0)).map(_.group(1)))
      .distinct
    assert(bucketsRead.length <= probedBuckets.length,
      s"1-doc probe touched ${bucketsRead.length} buckets for ${probedBuckets.length} bands")
  }
}
