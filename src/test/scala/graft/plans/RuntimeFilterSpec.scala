package graft.plans

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Plan pins for Spark's RUNTIME pruning machinery — the two features
  * that decide whether a 100 TB fact scan reads 100 TB or 1 TB:
  *
  *  - dynamic partition pruning (DPP): a dim-side filter becomes a
  *    runtime IN-filter on the fact table's PARTITION column, so whole
  *    hive partitions are skipped before a single fact byte is read;
  *  - runtime bloom-filter join pruning: a selective dim predicate is
  *    compiled into a bloom filter broadcast to the fact scan, dropping
  *    non-joining fact rows at the scan instead of at the shuffle.
  *
  * Both are free plan rewrites the engine's layout choices exist to
  * enable (hive-style key partitioning in Ingest U5; selective star
  * joins in q_join_broadcast). These tests pin that our table layouts
  * actually trigger them — a layout change that silently disables DPP
  * is a 100× regression at scale that no row-count test would catch.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on a hive-partitioned fact join") {
    val dir = tmpDir("graft_dpp")
    // the fact table laid out the way Ingest U5 materializes snapshots:
    // hive-partitioned by the join/filter key's partition column
    Tables.orders(spark, sf).write.partitionBy("o_orderpriority").parquet(s"$dir/orders")
    val fact = spark.read.parquet(s"$dir/orders")
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p")).distinct()
      .withColumn("keep", col("p").startsWith("1"))
    val q = fact.join(dim, col("o_orderpriority") === col("p"))
      .filter(col("keep"))
      .agg(sum(col("o_totalprice")).as("t"))
    val plan = q.queryExecution.executedPlan.treeString
    assert(plan.contains("dynamicpruning"), plan)
    assert(!q.collect().head.isNullAt(0))
  }

  test("runtime bloom filter prunes a shuffle-join fact scan at the source") {
    withConf(
      // the fact side is "big" relative to a 0-byte threshold (stands in
      // for the real 10 GB default a 100 TB scan clears trivially) and
      // the join must be a shuffle join for the bloom to have a point
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sf)
      val part = Tables.part(spark, sf).filter(col("p_size") === 1)
      val q = li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(sum(col("l_quantity")).as("t"))
      val plan = q.queryExecution.optimizedPlan.toString
      // InjectRuntimeFilter compiles the dim predicate into a
      // bloom_filter_agg subquery guarded by might_contain on the fact
      assert(plan.contains("might_contain"), plan)
      assert(plan.contains("bloom_filter_agg"), plan)
      assert(q.collect().nonEmpty)
    }
  }
}
