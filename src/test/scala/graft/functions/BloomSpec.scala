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
