package graft.functions

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Invariants of the user-controllable runtime filter (functions/Bloom)
  * that hold at ANY (items, bits) — the q_join_bloom oracle additionally
  * pins zero false positives at the query's chosen parameters.
  */
class BloomSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def sketch(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(Bloom.agg(col("o_custkey"), 1L << 14, 1L << 18).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

  test("no false negatives: every semi-join key passes the probe") {
    val bf = sketch(Tables.orders(spark, dir))
    val exact = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
    val missed = exact.filter(!Bloom.mightContain(bf, col("c_custkey"))).count()
    assert(missed == 0L)
  }

  test("sketch is partition-order invariant (pure OR of key hashes)") {
    val one = sketch(Tables.orders(spark, dir).coalesce(1))
    val many = sketch(Tables.orders(spark, dir).repartition(7, col("o_orderkey")))
    assert(java.util.Arrays.equals(one, many))
  }

  test("scalar-subquery probe is row-identical to the literal probe (r21 plan shape)") {
    // r21 moved the query-path probes to might_contain(scalar-subquery)
    // — the native InjectRuntimeFilter shape — so the sketch stops
    // being a driver collect + multi-MB plan literal. Same bits in,
    // same rows out, at any (items, bits).
    val bfDf = Tables.orders(spark, dir)
      .agg(Bloom.agg(col("o_custkey"), 1L << 14, 1L << 18).as("bf"))
    val bfBytes = bfDf.collect()(0).getAs[Array[Byte]](0)
    val viaLiteral = Tables.customer(spark, dir)
      .filter(Bloom.mightContain(bfBytes, col("c_custkey")))
      .select(col("c_custkey")).collect().map(_.getLong(0)).sorted.toSeq
    val viaSubquery = Tables.customer(spark, dir)
      .filter(Bloom.mightContain(bfDf, col("c_custkey")))
      .select(col("c_custkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSubquery == viaLiteral && viaLiteral.nonEmpty)
  }

  test("probe keeps a bounded superset: |bloom pass| < |customers| at tight bits") {
    // deliberately tiny sketch → false positives exist, but the pass
    // set still shrinks the scan (the filter is USEFUL even undersized)
    val bf = Tables.orders(spark, dir).limit(50)
      .agg(Bloom.agg(col("o_custkey"), 64L, 512L).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val n = Tables.customer(spark, dir).count()
    val pass = Tables.customer(spark, dir)
      .filter(Bloom.mightContain(bf, col("c_custkey"))).count()
    assert(pass < n)
  }
}
