package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.GQuery
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries`/`oracleSql` are populated from the single registry
  * [[graft.queries.GQuery.all]] (Relational ++ Extensions). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-schema broadcast join + revenue rollup — the canonical plan
    * the engine is built around. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_broadcast")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GQuery.all.map(g => g.name -> g.fn).toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GQuery.all.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
