package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Persisted inverted text index: serving must equal the token-stream
  * BM25 computation bit-for-bit, the query read must prune to the
  * query terms' hash buckets, and appends must follow the
  * delta+marker replay rules. */
class TextIndexSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val query = "data batch scan"

  private def docs() = Tables.documents(spark, sf).select($"doc_id", $"text")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"bm25").as[(Long, Double)].collect().toSeq

  test("base+delta serve equals Text.search over the full corpus bit-for-bit") {
    val dir = tmpDir("graft_tix") + "/idx"
    TextIndex.build(spark, dir, docs().filter(pmod($"doc_id", lit(2)) === 0))
    TextIndex.append(spark, dir, docs().filter(pmod($"doc_id", lit(2)) === 1), 0L)
    val served = canon(TextIndex.topK(spark, dir, query, 10))
    val direct = canon(Text.search(docs(), "doc_id", "text", query, 10))
    assert(served.nonEmpty)
    assert(served == direct)
  }

  test("the serve read partition-prunes to the query terms' buckets") {
    val dir = tmpDir("graft_tix2") + "/idx"
    TextIndex.build(spark, dir, docs())
    val plan = TextIndex.topK(spark, dir, query, 10)
      .queryExecution.executedPlan.toString
    // the _tb partition filter must reach the scan (directory pruning —
    // the inverted-index seek); a full-postings scan means the filter
    // was lost above the read
    assert(plan.contains("_tb"), s"no _tb partition filter in plan:\n$plan")
    // and the three terms hash to at most 3 of the 64 bucket dirs
    val buckets = Seq("data", "batch", "scan").toDF("term")
      .select(pmod(xxhash64($"term"), lit(TextIndex.Buckets.toLong)))
      .as[Long].collect().distinct
    assert(buckets.length <= 3)
  }

  test("replayed delta id is a no-op; empty batch commits a data-less marker") {
    val dir = tmpDir("graft_tix3") + "/idx"
    val half = docs().filter(pmod($"doc_id", lit(2)) === 0)
    TextIndex.build(spark, dir, half)
    assert(TextIndex.append(spark, dir, docs().filter(pmod($"doc_id", lit(2)) === 1), 0L))
    val before = canon(TextIndex.topK(spark, dir, query, 10))
    // replay: same id, different (garbage) content — must not commit
    assert(!TextIndex.append(spark, dir, half.limit(3), 0L))
    assert(canon(TextIndex.topK(spark, dir, query, 10)) == before)
    // empty batch: marker committed, serve unchanged
    assert(TextIndex.append(spark, dir, docs().limit(0), 1L))
    assert(TextIndex.deltaIds(spark, dir) == Seq(0L, 1L))
    assert(canon(TextIndex.topK(spark, dir, query, 10)) == before)
  }

  test("a batch whose text tokenizes to zero tokens commits a data-less marker, not a poisoned segment") {
    val dir = tmpDir("graft_tix_zerotok") + "/idx"
    TextIndex.build(spark, dir, docs())
    val before = canon(TextIndex.topK(spark, dir, query, 10))
    // rows exist but every text is null/empty/whitespace: a zero-row
    // partitioned write would leave a schema-less postings dir that
    // fails every later read with the marker committed LIVE — wedged
    // until rebuild
    val blank = Seq((9001L, ""), (9002L, "   "), (9003L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(TextIndex.append(spark, dir, blank, 0L))
    assert(TextIndex.deltaIds(spark, dir) == Seq(0L))
    assert(graft.ops.DeltaProtocol.liveDeltaIds(spark, dir).isEmpty)
    assert(canon(TextIndex.topK(spark, dir, query, 10)) == before)
    // and an all-blank corpus refuses to build (the base dirs must exist)
    val ex = intercept[IllegalArgumentException] {
      TextIndex.build(spark, tmpDir("graft_tix_zerotok2") + "/idx", blank)
    }
    assert(ex.getMessage.contains("zero tokens"))
    // CRITICALLY, the refusal happens BEFORE the prior index is cleared:
    // a bad rebuild against an all-blank corpus must leave the existing
    // healthy store committed and serving, not destroyed-and-uncommitted
    intercept[IllegalArgumentException] { TextIndex.build(spark, dir, blank) }
    assert(TextIndex.exists(spark, dir), "the committed index must survive a zero-token rebuild")
    assert(canon(TextIndex.topK(spark, dir, query, 10)) == before)
  }

  test("a legacy 2-column stats segment (pre-range format) still appends and serves") {
    val dir = tmpDir("graft_tix_legacy") + "/idx"
    val half = docs().filter(pmod($"doc_id", lit(2)) === 0)
    TextIndex.build(spark, dir, half)
    // rewrite the base stats as the PRE-id_lo 2-column format: both the
    // append overlap guard (exact-check fallback) and the serve-side
    // stats union must keep working against the mixed-schema layout
    val r = spark.read.parquet(s"$dir/stats").select($"t_total", $"n_docs").head()
    Seq((r.getLong(0), r.getLong(1))).toDF("t_total", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    TextIndex.append(spark, dir, docs().filter(pmod($"doc_id", lit(2)) === 1), 0L)
    val served = canon(TextIndex.topK(spark, dir, query, 10))
    assert(served.nonEmpty)
    assert(served == canon(Text.search(docs(), "doc_id", "text", query, 10)))
  }

  test("append fails loudly on a re-ingested doc_id; disjoint appends stay cheap") {
    val dir = tmpDir("graft_tix_dup") + "/idx"
    val base = docs().filter($"doc_id" < 40 && pmod($"doc_id", lit(2)) === 0)
    TextIndex.build(spark, dir, base)
    // overlapping batch (doc 0 already indexed): LOUD failure, and the
    // failed attempt must not commit — the delta id stays replayable
    val ex = intercept[IllegalStateException] {
      TextIndex.append(spark, dir, docs().filter($"doc_id" === 0), 0L)
    }
    assert(ex.getMessage.contains("append-only doc_id contract"))
    assert(TextIndex.deltaIds(spark, dir).isEmpty)
    // range-disjoint batch (40..59 vs base's [0,38]): admitted from the
    // 1-row range stats alone
    assert(TextIndex.append(spark, dir, docs().filter($"doc_id" >= 40 && $"doc_id" < 60), 0L))
    // interleaved-but-distinct ids (odd < 40): ranges intersect the
    // base, the exact check runs and correctly admits the batch
    assert(TextIndex.append(spark, dir,
      docs().filter($"doc_id" < 40 && pmod($"doc_id", lit(2)) === 1), 1L))
    // and a duplicate is rejected across DELTA segments too (41 ∈ delta 0)
    intercept[IllegalStateException] {
      TextIndex.append(spark, dir, docs().filter($"doc_id" === 41), 2L)
    }
  }

  test("streaming ingest twin: end-state serve equals full-corpus search; crash-replay safe") {
    val root = tmpDir("graft_tix4")
    val dir = root + "/idx"
    TextIndex.build(spark, dir, docs().filter(pmod($"doc_id", lit(3)) === 0))
    // batch-mode transactions (the foreachBatch body, driven directly)
    val b1 = docs().filter(pmod($"doc_id", lit(3)) === 1)
    val b2 = docs().filter(pmod($"doc_id", lit(3)) === 2)
    assert(graft.streaming.Streams.textBatch(b1, 0L, dir, root + "/out"))
    // crash between landing and marker is modeled by replay: committed id no-ops
    assert(!graft.streaming.Streams.textBatch(b1, 0L, dir, root + "/out"))
    assert(graft.streaming.Streams.textBatch(b2, 1L, dir, root + "/out"))
    val served = canon(TextIndex.topK(spark, dir, query, 10))
    val direct = canon(Text.search(docs(), "doc_id", "text", query, 10))
    assert(served == direct)
  }
}
