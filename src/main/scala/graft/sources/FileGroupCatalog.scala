package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, SupportsRead, Table, TableCapability, TableCatalog}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.{FileGroups, Ingest}

/** SQL-surface catalog for the file-group CDC tables — the last
  * experience gap against the reference's end product (a catalog-
  * queryable table, README.md:298-304): after
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_cdc", classOf[FileGroupCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft_cdc.root", "/data/cdc")
  * }}}
  *
  * every [[graft.cdc.FileGroups]] table under the root resolves through
  * plain SQL — `SELECT * FROM graft_cdc.employees`, including time
  * travel `VERSION AS OF n` (Spark routes it to
  * `loadTable(ident, version)`) — with the native parquet DSv2 read
  * path underneath: the scan is a real [[org.apache.spark.sql.
  * execution.datasources.v2.parquet.ParquetScan]] over exactly the
  * manifest-referenced files, so column pruning and filter pushdown
  * come from Spark itself, and record-key equality predicates
  * additionally prune FILE GROUPS from the manifest index (hash bucket
  * + key bloom for every key shape, [min,max] stats for single
  * integer keys — the [[graft.cdc.FileGroups.pointLookupTuples]]
  * metadata read, now reached from SQL). At 100 TB a `WHERE id = k`
  * catalog query scans ~1 file group, never the table — for integer,
  * string (UUID) and composite record keys alike.
  *
  * The DSv2 WRITE SURFACE stays blocked by design: every mutation
  * rides the crash-safe [[graft.cdc.FileGroups.commit]] protocol, not
  * blind DSv2 appends — SQL writes (`MERGE`/`UPDATE`/`DELETE`/
  * `INSERT`/`CREATE TABLE AS SELECT`) are LOWERED onto it by the
  * GraftExtensions analyzer rule ([[FileGroupMergeRule]]), `DROP
  * TABLE` is the guarded whole-table delete below, and plain CREATE
  * TABLE / ALTER / RENAME fail loudly with pointers.
  *
  * Config is re-read per lookup from the LIVE session conf (not the
  * `initialize` snapshot): Spark's CatalogManager caches the plugin
  * instance per name, and a stale root captured at first use would
  * silently serve the wrong warehouse after a conf change.
  *
  * Options: `root` (required) — the directory whose children are
  * file-group tables; `keys` (default `id`) — the record-key
  * column(s) bucket pruning probes. Integer, string and composite
  * keys all prune: a composite-key query needs every key column
  * equality-constrained to cut file groups (the scan builder's
  * cross-product tuple probes); anything else reads correctly via the
  * full referenced-file scan.
  */
class FileGroupCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private def conf(key: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$catalogName.$key")

  private def root: String = conf("root").getOrElse(
    throw new IllegalStateException(
      s"spark.sql.catalog.$catalogName.root is not set — point it at the file-group warehouse"))

  private def keys: Seq[String] =
    conf("keys").getOrElse("id").split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Precombine / latest-wins ordering columns — what MERGE INTO's
    * lowered commit orders by (the store convention: LSN). */
  private def ord: Seq[String] =
    conf("ord").getOrElse("lsn").split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def dirOf(ident: Identifier): String =
    (root +: (ident.namespace() :+ ident.name())).mkString("/")

  /** CTAS-lowering support ([[FileGroupCtasCommand]] resolves its
    * target dir and key/ord defaults through the owning catalog). */
  private[sources] def dirFor(ident: Identifier): String = dirOf(ident)
  private[sources] def defaultKeys: Seq[String] = keys
  private[sources] def defaultOrd: Seq[String] = ord

  /** Single-level namespace: tables live directly under the root. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root))) Array.empty
    else fs.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => FileGroups.committedId(spark, s"$root/$n").isDefined)
      .sorted
      .map(Identifier.of(Array.empty, _))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    FileGroups.committedId(spark, dirOf(ident)).isDefined

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF n` — Spark's time-travel resolution lands here. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF t` — Spark hands the instant as MICROSECONDS
    * since the epoch. Resolves to the LATEST retained version whose
    * commit instant (the atomic `_COMMIT_<id>` marker's mtime — the
    * moment that version became readable) is <= the requested instant;
    * an instant predating every retained commit fails with the
    * retained versions and their commit times listed. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (FileGroups.committedId(spark, dir).isEmpty) throw new NoSuchTableException(ident)
    val tsMillis = timestamp / 1000L
    val commits = Ingest.snapshotVersions(spark, dir)
      .flatMap(v => FileGroups.commitTimeOf(spark, dir, v).map(v -> _))
    val id = commits.filter(_._2 <= tsMillis).map(_._1).maxOption.getOrElse {
      val listed = commits.map { case (v, t) =>
        s"v$v @ ${java.time.Instant.ofEpochMilli(t)}" }.mkString(", ")
      throw new IllegalArgumentException(
        s"no retained version of ${ident.name()} committed at or before " +
          s"${java.time.Instant.ofEpochMilli(tsMillis)} (retained: $listed)")
    }
    load(ident, Some(id))
  }

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val dir = dirOf(ident)
    val committed = FileGroups.committedId(spark, dir)
      .getOrElse(throw new NoSuchTableException(ident))
    val id = version.getOrElse(committed)
    // the same purge-resurrection guard as FileGroups.readAt — SQL time
    // travel must not serve pre-purge versions while a crashed purge's
    // intent marker stands (the keys those versions reference are
    // supposed to be forgotten)
    FileGroups.assertNoPurgeResurrection(spark, dir, id)
    if (!Ingest.snapshotVersions(spark, dir).contains(id))
      throw new IllegalArgumentException(
        s"version $id of ${ident.name()} is not retained (committed: $committed, " +
          s"retained: ${Ingest.snapshotVersions(spark, dir).mkString(", ")})")
    // schema + key/ordering columns from the PINNED version's manifest
    // in one read (keys are frozen at creation, so any version agrees).
    // Keys/ord come from the MANIFEST when recorded (the table is
    // self-describing — a misconfigured `keys` conf could otherwise
    // hash probes with the wrong bucketing and silently prune live
    // file groups); the catalog conf is the fallback for pre-header
    // tables only
    val (mSchema, mKeys, mOrd) = FileGroups.tableMetaFor(spark, dir, id)
    new FileGroupTable(spark, s"$catalogName.${ident.name()}", dir, id,
      mKeys.getOrElse(keys), mOrd.getOrElse(ord), mSchema)
  }

  /** Maintenance procedures ([[FileGroupProcedures]]) live in the
    * catalog's root namespace AND the Iceberg/Hudi-conventional
    * `system` namespace — `CALL graft_cdc.rollback(...)` and
    * `CALL graft_cdc.system.rollback(...)` both resolve, so operators
    * coming from either convention land on the same service. */
  private def isProcNamespace(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("system"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    if (!isProcNamespace(namespace)) throw new NoSuchNamespaceException(namespace)
    FileGroupProcedures.Names.map(Identifier.of(namespace, _)).toArray
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!isProcNamespace(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    FileGroupProcedures.resolve(ident.name(), spark, root, keys, ord).getOrElse(
      throw new IllegalArgumentException(
        s"no procedure '${ident.name()}' in catalog $catalogName " +
          s"(available: ${FileGroupProcedures.Names.mkString(", ")})"))
  }

  /** Plain CREATE TABLE stays unsupported BY DESIGN: a file-group
    * table IS its first versioned commit (schema + manifest + marker
    * land together) — an empty DSv2 shell would be a table no reader
    * could resolve. `CREATE TABLE ... AS SELECT` IS supported: the
    * GraftExtensions analyzer rule lowers it onto a v0
    * [[FileGroups.commit]] before planning ever reaches this method
    * ([[FileGroupCtasCommand]]); landing here with a CTAS therefore
    * means the session was built without the extension. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"plain CREATE TABLE is not supported on $catalogName: a file-group table is " +
        "its first versioned commit — use CREATE TABLE ... AS SELECT (requires the " +
        "session built withExtensions(GraftExtensions)) or FileGroups.commit")

  /** `ALTER TABLE ... ADD COLUMNS` — the one supported table change,
    * lowered to [[FileGroups.widenSchema]]'s metadata-only commit: a
    * new version whose manifest carries the widened schema, every data
    * file carried forward by reference (the added columns read as
    * typed NULLs until data lands — the manifest-typed scan null-fills
    * them natively). Top-level nullable columns only; a position or a
    * DEFAULT fails loudly (the store appends columns and has no
    * default-value metadata — write the values through UPDATE/MERGE).
    * Every other change kind keeps failing loudly: type changes and
    * renames would break the committed data contract, and width-only
    * drift already reconciles on write. */
  override def alterTable(ident: Identifier,
                          changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val dir = dirOf(ident)
    if (FileGroups.committedId(spark, dir).isEmpty) throw new NoSuchTableException(ident)
    val fields = changes.map {
      case a: TableChange.AddColumn =>
        if (a.fieldNames().length != 1)
          throw new UnsupportedOperationException(
            s"ALTER TABLE on $catalogName can only add TOP-LEVEL columns, not nested " +
              s"field '${a.fieldNames().mkString(".")}' — assign the whole struct instead")
        if (!a.isNullable)
          throw new UnsupportedOperationException(
            s"added column '${a.fieldNames().head}' must be nullable: existing rows " +
              "have no value for it")
        if (a.position() != null)
          throw new UnsupportedOperationException(
            "ALTER TABLE ... ADD COLUMN FIRST/AFTER is not supported: the store " +
              "appends columns (reads address columns by name, not position)")
        if (a.defaultValue() != null)
          throw new UnsupportedOperationException(
            "ALTER TABLE ... ADD COLUMN DEFAULT is not supported: the store keeps no " +
              "default-value metadata — backfill through UPDATE/MERGE instead")
        val f = org.apache.spark.sql.types.StructField(
          a.fieldNames().head, a.dataType(), nullable = true)
        Option(a.comment()).fold(f)(f.withComment)
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE ${other.getClass.getSimpleName} is not supported on " +
            s"$catalogName: only ADD COLUMNS lowers to a schema-widening commit " +
            "(type/rename changes would break the committed data contract; " +
            "width drift reconciles on write)")
    }
    FileGroups.widenSchema(spark, dir, fields.toSeq)
    loadTable(ident)
  }

  /** `DROP TABLE` — the whole-table terminal operation: a guarded
    * recursive delete of the table directory (manifests, markers,
    * savepoints, data — everything; a standing purge intent's mandate
    * is trivially satisfied by total removal). Guarded: only a
    * directory holding a COMMITTED file-group table is deleted — an
    * arbitrary child dir that never committed returns false (Spark
    * then raises NoSuchTable unless IF EXISTS), so a typo'd name can
    * never recursively delete unrelated data. Key-targeted removal
    * with history stays [[FileGroups.purgeKeyTuples]].
    *
    * DROP is deliberately OUTSIDE the cross-process lock provider
    * (`spark.graft.cdc.fsLock`): the delete destroys the lock file
    * itself, so holding it through the drop cannot work — a terminal,
    * operator-serialized action by design (stop the writers first;
    * a concurrent foreign commit racing a DROP fails loudly on the
    * vanished directory, never reports success). */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    FileGroups.committedId(spark, dir).isDefined && {
      val p = new Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"RENAME is not supported on $catalogName: table identity is its directory " +
        "(rename = copy + drop, an operator decision)")
}

/** One file-group table pinned at a committed version. The scan
  * delegates to the native parquet DSv2 builder over the manifest's
  * referenced bucket dirs ([[FileGroupScanBuilder]]), so the physical
  * plan is indistinguishable from a hand-written parquet read of
  * exactly the live files. */
private[sources] class FileGroupTable(spark: SparkSession, tableName: String,
                                      val dir: String, val snapshotVersion: Long,
                                      keys: Seq[String], val ordSeq: Seq[String] = Seq("lsn"),
                                      preloadedSchema: Option[StructType] = None)
    extends Table with SupportsRead {

  /** Record-key columns ([[FileGroupMergeRule]] reads them). */
  def keySeq: Seq[String] = keys

  override def name(): String = tableName

  /** Schema rides in from loadTable's single manifest read; the lazy
    * re-read is only the fallback for a directly-constructed table. */
  override lazy val schema: StructType =
    preloadedSchema.orElse(FileGroups.manifestSchema(spark, dir, snapshotVersion)).getOrElse(
      throw new IllegalStateException(
        s"manifest v$snapshotVersion at $dir carries no schema — pre-schema-header table; rebuild"))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** `SHOW TBLPROPERTIES` / `DESCRIBE TABLE EXTENDED` surface: the
    * table's pinned identity (keys/ord/buckets — exactly what CTAS
    * TBLPROPERTIES set, read back from the self-describing manifest)
    * plus the live cleaner retention policy and the resolved snapshot
    * version — so an operator can answer "what is this table keyed
    * by / how much history does it keep" from SQL alone. */
  override def properties(): util.Map[String, String] =
    Map("version" -> snapshotVersion.toString, "location" -> dir,
      "keys" -> keys.mkString(","), "ord" -> ordSeq.mkString(","),
      "buckets" -> FileGroups.manifestBuckets(spark, dir, snapshotVersion).toString,
      "retain" -> FileGroups.retention(spark, dir).toString).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // fail-loudly guard (r19 advice): the PUBLIC `startingVersion`
    // option is consumed by IncrementalReadRule (GraftExtensions) —
    // the rule strips it and plants the internal file-cut option, so
    // the only way it can still be here is a session that registered
    // the catalog via spark.sql.catalog.* conf WITHOUT the extensions.
    // Silently ignoring it would serve the FULL snapshot as an
    // "increment" — a superset handed to a consumer that will apply it
    // as a delta. Same posture as DeltaStream's option validation.
    if (options.containsKey("startingVersion"))
      throw new IllegalStateException(
        s"read option startingVersion on $tableName requires the session built " +
          "withExtensions(graft.functions.GraftExtensions) (or spark.sql.extensions=" +
          "graft.functions.GraftExtensions) — without the extension rule the option " +
          "would be silently ignored and the FULL snapshot served as an increment")
    FileGroupScanBuilder(spark, dir, snapshotVersion, keys, schema, options)
  }
}
