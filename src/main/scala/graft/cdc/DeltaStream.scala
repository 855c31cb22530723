package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The CONFIG-DRIVEN continuous-ingest runner — the engine's face of
  * the reference's actual invocation shape (reference README.md:277-343:
  * a DeltaStreamer job configured by one options map — table name,
  * record key field, precombine field, source topic, checkpoint
  * location — plus hive_sync so downstream SQL can query the landed
  * table): ONE `Map[String, String]` starts the checkpointed stream
  * that maintains the SQL-queryable file-group upsert table.
  *
  * Every semantic is the already-spec'd composed path ([[FileGroups.run]]
  * → commitStreamBatch's exactly-once markers → the `graft_cdc` DSv2
  * catalog); this object only BINDS it to configuration, so an operator
  * needs zero Scala to run the reference's day-one job:
  * {{{
  * DeltaStream.run(spark, Map(
  *   "graft.table.name"          -> "employees",
  *   "graft.target.path"         -> "/warehouse/cdc",
  *   "graft.source.dir"          -> "/landing/debezium.public.employees",
  *   "graft.checkpoint.location" -> "/warehouse/_ckpt/employees",
  *   "graft.recordkey.field"     -> "id",
  *   "graft.precombine.field"    -> "lsn",
  *   "graft.sync.catalog"        -> "graft_cdc"))
  * }}}
  *
  * Option names mirror the reference's `hoodie.table.name` /
  * `hoodie.datasource.write.recordkey.field` /
  * `...precombine.field` / `...hive_sync.*` roles under the `graft.`
  * prefix. Unknown option names are rejected LOUDLY — a typo'd
  * `graft.recordkey.fields` silently falling back to the default key
  * would pin the wrong record identity forever (the same posture as
  * the CTAS TBLPROPERTIES validation).
  *
  * Scale: identical to the underlying stream — per-trigger cost ∝ the
  * batch's dirty-bucket bytes, never table bytes; catalog sync is two
  * driver-side conf entries (the local stand-in for an external
  * metastore, which this sandbox does not have).
  */
object DeltaStream {

  /** Table directory name under [[TargetPath]] (role of `hoodie.table.name`). */
  val TableName = "graft.table.name"
  /** Warehouse root the table lands under (and the synced catalog's root). */
  val TargetPath = "graft.target.path"
  /** Topic directory of Kafka-shaped newline-JSON segments (S1's
    * file-emulated source — the one seam a production Kafka port touches). */
  val SourceDir = "graft.source.dir"
  /** Structured Streaming checkpoint location. The store's own
    * `_STREAM_BATCH_` markers make replays exactly-once even if this
    * checkpoint is lost. */
  val CheckpointLocation = "graft.checkpoint.location"
  /** Comma-separated record key column(s); default `id`
    * (role of `hoodie.datasource.write.recordkey.field`). */
  val RecordKeyField = "graft.recordkey.field"
  /** Comma-separated precombine / ordering column(s); default `lsn`
    * (role of `hoodie.datasource.write.precombine.field`). */
  val PrecombineField = "graft.precombine.field"
  /** File-group (hash bucket) count; default 16. */
  val Buckets = "graft.buckets"
  /** Optional: register the file-group DSv2 catalog under this name,
    * rooted at [[TargetPath]], so `SELECT ... FROM <cat>.<table>`
    * works the moment the first batch commits
    * (role of `hoodie.datasource.hive_sync.*`). */
  val SyncCatalog = "graft.sync.catalog"
  /** Optional: DDL of the CDC envelope's `after`/`before` row schema
    * (e.g. `"id INT, full_name STRING"`), enabling the declared fast
    * path for non-employees topics; default the employees envelope. */
  val SourceSchemaDdl = "graft.source.schema.ddl"
  /** Optional: the table's cleaner retention window — how many trailing
    * committed versions GC keeps, i.e. the `VERSION AS OF`-reachable
    * history (role of `hoodie.cleaner.commits.retained`); >= 2, set
    * before the stream's first commit via [[FileGroups.setRetention]]. */
  val Retain = "graft.retain"

  private val Required = Seq(TableName, TargetPath, SourceDir, CheckpointLocation)
  private val Known = (Required ++ Seq(
    RecordKeyField, PrecombineField, Buckets, SyncCatalog, SourceSchemaDdl, Retain)).toSet

  /** Validate the options map, sync the catalog if asked, and start
    * the checkpointed stream. Returns the running [[StreamingQuery]]
    * (callers own its lifecycle — `awaitTermination` for the
    * continuous deployment, `processAllAvailable` for a bounded run). */
  def run(spark: SparkSession, options: Map[String, String]): StreamingQuery = {
    val unknown = options.keySet -- Known
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown DeltaStream option(s) ${unknown.toSeq.sorted.mkString("'", "', '", "'")} — " +
          s"supported: ${Known.toSeq.sorted.mkString(", ")} (a typo here would silently " +
          "fall back to a default and pin the wrong table identity)")
    val missing = Required.filterNot(options.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"missing required DeltaStream option(s): ${missing.mkString(", ")}")
    // identifier discipline: a '/' in the table name would land an
    // unaddressable nested dir; a '.' in the catalog name would parse
    // as a conf sub-key (spark.sql.catalog.a.b = option b of catalog a)
    // — both would "work" at write time and break at read time
    def ident(k: String): Unit = options.get(k).foreach { v =>
      if (!v.matches("[A-Za-z0-9_]+"))
        throw new IllegalArgumentException(
          s"DeltaStream option $k='$v' must be a plain identifier ([A-Za-z0-9_]+)")
    }
    ident(TableName); ident(SyncCatalog)

    def cols(k: String, dflt: Seq[String]): Seq[String] = options.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty).getOrElse(dflt)
    val buckets = options.get(Buckets).map { s =>
      s.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"DeltaStream option $Buckets='$s' must be a positive integer"))
    }.getOrElse(16)
    val schema = options.get(SourceSchemaDdl)
      .map(ddl => Envelope.envelope(StructType.fromDDL(ddl)))
      .getOrElse(Envelope.employeesEnvelope)
    // parsed (and range-checked by setRetention) with the other
    // validations, BEFORE any side effect (catalog conf, table dir)
    val retain = options.get(Retain).map { s =>
      val n = s.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"DeltaStream option $Retain='$s' must be an integer >= 2"))
      require(n >= 2,
        s"retention must be >= 2 (the protocol keeps the current + one prior version); got $n")
      n
    }

    val root = options(TargetPath).stripSuffix("/")
    val tableDir = s"$root/${options(TableName)}"
    options.get(SyncCatalog).foreach { cat =>
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.FileGroupCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    }
    // retention lands BEFORE the first commit so every GC pass —
    // including the very first trigger's — honors the policy
    retain.foreach(FileGroups.setRetention(spark, tableDir, _))
    FileGroups.run(spark, options(SourceDir), tableDir, options(CheckpointLocation),
      schema = schema,
      keys = cols(RecordKeyField, Seq("id")),
      ord = cols(PrecombineField, Seq("lsn")),
      nBuckets = buckets)
  }
}
