package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.graft.Bridge

/** Spark's runtime-filter machinery — `BloomFilterAggregate` /
  * `BloomFilterMightContain`, the codegen'd expressions the
  * `InjectRuntimeFilter` rule plants under shuffle joins — surfaced as
  * Column functions, so a pipeline can BUILD a key filter once and
  * apply it to any number of later scans (the cross-job runtime filter
  * the optimizer can't plant because it only sees one query at a
  * time). Keys are hashed with the same XxHash64(seed=42) the
  * built-in rule uses; the sketch is a kilobytes-scale byte array —
  * driver-bounded metadata, like IvfIndex centroids.
  *
  * Semantics: no false negatives ever (a true key always passes);
  * false-positive rate set by (estimated items, bits). Inserted-key
  * ORDER does not affect the bits (pure OR), so a sketch over the
  * same key set is bit-identical however it was partitioned — the
  * property BloomSpec pins.
  */
object Bloom {

  /** Aggregate a long key column into a serialized bloom filter. */
  def agg(key: Column, estimatedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key)), 42L),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized bloom filter: true iff `key` MIGHT be in the
    * set the filter was built over (never false for a true member). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(Bridge.expression(key)), 42L)))

  /** [[mightContain]] with the sketch supplied as a 1-row DataFrame
    * (the [[agg]] result) instead of collected bytes — the predicate
    * becomes `might_contain(scalar-subquery[bloom_filter_agg(...)],
    * xxhash64(key))`, EXACTLY the plan shape Spark's own
    * InjectRuntimeFilter plants (round 21, guide §3.2/§5): the bloom
    * bytes never visit the driver as a query-path collect, and the
    * multi-MB sketch stops being a plan LITERAL (a 1<<24-bit sketch
    * embedded as a literal made a 4 MB plan and a >1 MB task binary
    * re-broadcast every stage; the subquery result is transported by
    * the subquery machinery instead). Same bits, same no-false-
    * negative contract — BloomSpec pins equality against the literal
    * path. */
  def mightContain(bloomDf: org.apache.spark.sql.DataFrame, key: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomDf.queryExecution.analyzed),
      new XxHash64(Seq(Bridge.expression(key)), 42L)))
}
