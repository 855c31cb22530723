package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** U7 — catalog sync (reference README.md:298-304, 311): the reference's
  * end product is a Hive/Glue-registered table ("so they can be
  * queried", `hive_sync.mode=hms`). Local analog: register into the
  * Spark session catalog, either managed (`saveAsTable`) or external
  * (`CREATE TABLE ... USING parquet LOCATION`), so downstream SQL
  * reaches the data by name via `spark.table(...)`.
  */
object Catalog {

  /** Managed registration: writes the data into the warehouse. */
  def sync(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  /** External registration over an existing parquet location — the
    * closer analog of Hudi's Hive sync (data stays where the writer put
    * it; only metadata is registered). */
  def syncExternal(spark: SparkSession, name: String, parquetPath: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$parquetPath'")
  }

  /** Bucketed registration: pre-hash-partitions the data on the join
    * key at write time so repeated joins/aggregations on that key run
    * WITHOUT a shuffle (the planner sees compatible output
    * partitioning on both sides). The 100 TB pattern for fact-fact
    * joins that recur: pay the shuffle once at ingest, never again. */
  def syncBucketed(spark: SparkSession, name: String, df: DataFrame,
                   buckets: Int, bucketCols: Seq[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def write(): Unit = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
    try write()
    catch {
      // A prior JVM's managed dir can survive while the catalog entry is
      // gone; saveAsTable refuses the orphan (LOCATION_ALREADY_EXISTS).
      // Recover ONLY on that failure — never pre-delete — so two JVMs
      // sharing a warehouse can't wipe each other's live table data. The
      // location is catalog-resolved (defaultTablePath handles db.tbl
      // qualifiers; a hand-built warehouse/<name> guess does not).
      case e: org.apache.spark.SparkThrowable
          if Option(e.getCondition).exists(_.startsWith("LOCATION_ALREADY_EXISTS")) =>
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(ident))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        write()
    }
  }
}
