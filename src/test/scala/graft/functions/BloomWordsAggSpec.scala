package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r21 commit-path fusion: [[BloomWordsAgg]] replaced the exploded
  * (bucket, word) bit_or bloom build inside FileGroups.rewriteEntries.
  * The manifest sketch is a pure OR of per-row bit positions, so the
  * fused aggregate must produce BIT-IDENTICAL words to the historical
  * exploded shape on the same keys — this spec pins that equivalence
  * (probe behavior itself is pinned by FileGroupsSpec's lookup suite).
  */
class BloomWordsAggSpec extends SparkSpec {
  import spark.implicits._

  private val BloomBits = 4096L
  private val Words = 64
  private val K = 3

  test("fused word aggregate is bit-identical to the exploded bit_or build") {
    val rows = (1L to 500L).map(i => (i % 7, s"key_$i")).toDF("b", "k")
    val posArr = array((0 until K).map(i =>
      pmod(xxhash64(col("k"), lit(i)), lit(BloomBits))): _*)

    // historical shape: explode positions → (b, word) bit_or → driver fold
    val exploded = rows
      .select(col("b"), explode(posArr).as("pos"))
      .selectExpr("b", "CAST(pos / 64 AS INT) AS w",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS m")
      .groupBy(col("b"), col("w"))
      .agg(expr("bit_or(m)").as("bits"))
      .collect().groupBy(_.getLong(0))
      .map { case (b, rs) =>
        val arr = Array.fill(Words)(0L)
        rs.foreach(r => arr(r.getInt(1)) = r.getLong(2))
        b -> arr.toSeq
      }

    // fused shape: one grouped aggregation, words decoded from bytes
    val fused = rows.groupBy(col("b"))
      .agg(BloomWordsAgg.agg(posArr, Words).as("bloom"))
      .collect().map { r =>
        val bb = java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1))
        r.getLong(0) -> Seq.fill(Words)(bb.getLong)
      }.toMap

    assert(fused.keySet == exploded.keySet && fused.nonEmpty)
    fused.foreach { case (b, words) => assert(words == exploded(b), s"bucket $b") }
    // and the sketch is partitioning-invariant (pure OR)
    val one = rows.coalesce(1).groupBy(col("b"))
      .agg(BloomWordsAgg.agg(posArr, Words).as("bloom"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val many = rows.repartition(13, col("k")).groupBy(col("b"))
      .agg(BloomWordsAgg.agg(posArr, Words).as("bloom"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(one == many)
  }
}
