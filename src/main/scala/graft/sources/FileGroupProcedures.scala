package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.{FileGroups, Ingest, Savepoints}

/** The MAINTENANCE half of the SQL door on the file-group CDC store —
  * Spark 4's DSv2 procedure surface (`CALL catalog.proc(...)`,
  * SPARK-44167), mirroring how the reference's downstream users
  * operate their DeltaStreamer tables: Hudi ships its table services
  * as Spark SQL procedures (`create_savepoint`, `show_commits`,
  * `rollback_to_savepoint`, ... — README.md:348's CLI surface moved
  * into SQL), so an operator never needs a JVM to savepoint, roll
  * back, inspect or purge a table. Each procedure is a thin SQL
  * binding over the EXISTING crash-safe service ([[Savepoints]],
  * [[FileGroups.purgeKeys]]) — no new mutation protocol, the SQL door
  * and the Scala door cannot disagree.
  *
  * All procedures resolve tables against the owning catalog's live
  * `root`, accept both positional and named (`table => 'employees'`)
  * arguments, and return their outcome as ROWS (a [[LocalScan]] the
  * analyzer turns into a local relation) so `CALL` results compose
  * with SQL like any query.
  *
  * Everything here is driver-side manifest/marker metadata except
  * `purge_keys`, whose data rewrite is the bucket-pruned
  * [[FileGroups.purgeKeys]] path — nothing scales with table size
  * beyond the purge's own touched file groups.
  */
private[sources] object FileGroupProcedures {

  /** Procedure names the catalog lists/loads (empty namespace and the
    * Iceberg/Hudi-conventional `system` namespace both resolve). */
  val Names: Seq[String] =
    Seq("show_commits", "show_file_groups", "create_savepoint", "release_savepoint",
      "rollback", "purge_keys", "clean", "run_compaction", "run_clustering")

  def resolve(name: String, spark: => SparkSession, root: => String,
              keys: => Seq[String], ord: => Seq[String]): Option[UnboundProcedure] = name match {
    case "show_commits" => Some(new ShowCommits(spark, root))
    case "show_file_groups" => Some(new ShowFileGroups(spark, root))
    case "create_savepoint" => Some(new CreateSavepoint(spark, root))
    case "release_savepoint" => Some(new ReleaseSavepoint(spark, root))
    case "rollback" => Some(new RollbackProc(spark, root))
    case "purge_keys" => Some(new PurgeKeys(spark, root, keys))
    case "clean" => Some(new CleanProc(spark, root))
    case "run_compaction" => Some(new RunCompaction(spark, root, keys, ord))
    case "run_clustering" => Some(new RunClustering(spark, root))
    case _ => None
  }

  /** Shared shape: every procedure is its own bound form (binding is
    * pure parameter validation, which the analyzer already does from
    * `parameters()`), non-deterministic (reads/mutates table state),
    * and returns one [[LocalScan]] of result rows. */
  private abstract class FgProcedure(spark: => SparkSession, root: => String)
      extends UnboundProcedure with BoundProcedure {

    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    protected def session: SparkSession = spark

    /** The `table` argument (position 0, every procedure), with a
      * clean error on NULL — `getUTF8String(0).toString` alone would
      * NPE with no actionable message. */
    protected def tableArg(input: InternalRow): String = {
      require(!input.isNullAt(0), s"${name()}: the 'table' argument must not be NULL")
      input.getUTF8String(0).toString
    }

    /** Resolve `table` to its warehouse dir + committed head version,
      * failing loudly on an unknown table (matching the catalog's
      * NoSuchTable behavior). Returned TOGETHER so callers needing the
      * head (purge, show_file_groups' default) don't pay a second
      * directory listing for the id this check already resolved. */
    protected def resolveTable(table: String): (String, Long) = {
      val dir = s"$root/$table"
      FileGroups.committedId(spark, dir) match {
        case Some(id) => (dir, id)
        case None => throw new IllegalArgumentException(
          s"no committed file-group table '$table' under $root")
      }
    }

    protected def resolveDir(table: String): String = resolveTable(table)._1

    protected def in(name: String, dt: DataType): ProcedureParameter =
      ProcedureParameter.in(name, dt).build()

    protected def result(schema: StructType, out: Seq[InternalRow]): util.Iterator[Scan] = {
      val materialized = out.toArray
      util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = materialized
        override def readSchema(): StructType = schema
      }).iterator()
    }
  }

  /** `CALL c.show_commits(table)` — the retained timeline: one row per
    * retained version with its commit instant (the `_COMMIT_` marker
    * mtime — what `TIMESTAMP AS OF` resolves against), savepoint pin,
    * and manifest-level size stats. Read-only metadata. */
  private final class ShowCommits(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "show_commits"
    override def description(): String =
      "retained versions of a file-group table: commit time, savepoint pin, size stats"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType))

    private val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = true),
      StructField("savepointed", BooleanType, nullable = false),
      StructField("file_groups", IntegerType, nullable = false),
      StructField("num_rows", LongType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = resolveDir(tableArg(input))
      val pinned = Savepoints.savepoints(session, dir)
      val rows = Ingest.snapshotVersions(session, dir).sorted.map { v =>
        val at = FileGroups.commitTimeOf(session, dir, v)
          .map(ms => ms * 1000L: java.lang.Long).orNull
        val (groups, n) = FileGroups.manifestStats(session, dir, v)
        InternalRow(v, at, pinned.contains(v), groups, n)
      }
      result(schema, rows)
    }
  }

  /** `CALL c.show_file_groups(table[, version])` — the physical-layout
    * view (Hudi's `show_fsview_all` role): one row per file group of
    * the requested (default: current) retained version, with its data
    * path, row count, the [lo,hi] key stats when the
    * single-integer-key index carries them, and whether a key bloom is
    * present. The operator's answer to "why didn't my probe prune" /
    * "which bucket is the fat one" — manifest metadata only, no data
    * read. */
  private final class ShowFileGroups(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "show_file_groups"
    override def description(): String =
      "per-file-group layout of a retained version: path, rows, key stats, bloom presence"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType),
        ProcedureParameter.in("version", LongType).defaultValue("-1").build())

    private val schema = StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("num_rows", LongType, nullable = false),
      StructField("key_lo", LongType, nullable = true),
      StructField("key_hi", LongType, nullable = true),
      StructField("has_bloom", BooleanType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val (dir, head) = resolveTable(tableArg(input))
      // ONLY the sentinel -1 (the declared default) means "the head":
      // any other negative (a computed head-minus-N gone negative) or
      // an explicit NULL must fail the retained-version validation, not
      // silently serve the current layout
      require(!input.isNullAt(1),
        "show_file_groups: 'version' must be a retained version id, or omitted for the head")
      val requested = input.getLong(1)
      val id =
        if (requested == -1L) head
        else {
          val retained = Ingest.snapshotVersions(session, dir)
          if (!retained.contains(requested))
            throw new IllegalArgumentException(
              s"version $requested is not retained (retained: ${retained.mkString(", ")})")
          requested
        }
      val rows = FileGroups.manifestEntries(session, dir, id).map {
        case (bucket, rel, n, lo, hi, bloom) =>
          InternalRow(bucket, UTF8String.fromString(rel), n,
            lo.map(java.lang.Long.valueOf).orNull,
            hi.map(java.lang.Long.valueOf).orNull, bloom)
      }
      result(schema, rows)
    }
  }

  private val versionOutcome = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("applied", BooleanType, nullable = false)))

  /** `CALL c.create_savepoint(table, version)` — pin a retained version
    * against GC and rollback ([[Savepoints.savepoint]]). `applied` is
    * false when the version is not retained (a savepoint of nothing
    * pins nothing) or the pin already exists. */
  private final class CreateSavepoint(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "create_savepoint"
    override def description(): String = "pin a retained version against GC and rollback"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType), in("version", LongType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = resolveDir(tableArg(input))
      val v = input.getLong(1)
      result(versionOutcome, Seq(InternalRow(v, Savepoints.savepoint(session, dir, v))))
    }
  }

  /** `CALL c.release_savepoint(table, version)` — drop the pin; the
    * version becomes ordinary GC fodder. */
  private final class ReleaseSavepoint(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "release_savepoint"
    override def description(): String = "release a savepoint pin"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType), in("version", LongType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = resolveDir(tableArg(input))
      val v = input.getLong(1)
      val had = Savepoints.savepoints(session, dir).contains(v)
      Savepoints.release(session, dir, v)
      result(versionOutcome, Seq(InternalRow(v, had)))
    }
  }

  /** `CALL c.rollback(table, version)` — restore the table to a
    * retained version, removing every commit above it
    * ([[Savepoints.rollback]]: markers first, so no reader ever
    * resolves a half-deleted version; savepointed versions above the
    * target REFUSE the rollback loudly). A standing crashed-purge
    * intent is completed first — rolling back around an unfinished
    * purge could otherwise leave its marker pointing at history the
    * rollback already rewrote. Returns the removed version ids. */
  private final class RollbackProc(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "rollback"
    override def description(): String =
      "restore the table to a retained version; removes every commit above it"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType), in("version", LongType))

    private val schema = StructType(Seq(
      StructField("removed_version", LongType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = resolveDir(tableArg(input))
      val v = input.getLong(1)
      // complete a crashed purge BEFORE validating the target: its
      // forget step may remove pre-purge versions, and validating
      // against the pre-recovery listing would accept a target the
      // recovery is about to forget (then silently no-op on it)
      FileGroups.completePendingPurge(session, dir)
      val retained = Ingest.snapshotVersions(session, dir)
      // distinguish "not retained" (error: the restore target does not
      // exist) from "already the head" (no-op: nothing above to remove)
      if (!retained.contains(v))
        throw new IllegalArgumentException(
          s"version $v is not retained (retained: ${retained.mkString(", ")}) — " +
            "rollback needs an existing restore target")
      val removed = Savepoints.rollback(session, dir, v)
      result(schema, removed.sorted.map(InternalRow(_)))
    }
  }

  /** `CALL c.clean(table[, retain])` — the cleaner as a table service
    * (Hudi's `run_clean` role): optionally update the table's retention
    * policy ([[FileGroups.setRetention]] — how many trailing versions
    * every GC pass keeps, the `VERSION AS OF`-reachable window), then
    * reclaim versions outside it NOW. Returns one row per reclaimed
    * version, oldest first (empty = nothing outside the window);
    * savepointed versions never appear — the pin wins over the window.
    * Driver-side manifest/marker metadata only. */
  private final class CleanProc(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "clean"
    override def description(): String =
      "reclaim versions outside the retention window; optionally set the window first"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType),
        ProcedureParameter.in("retain", LongType).defaultValue("-1").build())

    private val schema = StructType(Seq(
      StructField("reclaimed_version", LongType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dir = resolveDir(tableArg(input))
      // ONLY the sentinel -1 (the declared default) means "keep the
      // stored policy": an explicit NULL or a computed negative must
      // fail setRetention's >= 2 validation, not silently no-op
      require(!input.isNullAt(1),
        "clean: 'retain' must be a version count >= 2, or omitted to keep the stored policy")
      val requested = input.getLong(1)
      // range-check BEFORE narrowing: a silent toInt wrap (2^32+5 → 5)
      // would shrink the window and hand GC versions the operator
      // asked to keep — the same lossy-cast class the probe API rejects
      val retain = if (requested == -1L) None else {
        require(requested >= 2 && requested <= Int.MaxValue,
          s"clean: 'retain' must be between 2 and ${Int.MaxValue}; got $requested")
        Some(requested.toInt)
      }
      val reclaimed = FileGroups.clean(session, dir, retain)
      result(schema, reclaimed.map(InternalRow(_)))
    }
  }

  private val serviceOutcome = StructType(Seq(
    StructField("version", LongType, nullable = true),
    StructField("applied", BooleanType, nullable = false)))

  /** Shared layout guard of the MOR/clustering services: they serve the
    * MOR / versioned-snapshot layouts (`v<id>` base dirs + log deltas),
    * which share the catalog root and the `_COMMIT_<id>` convention but
    * are NOT file-group tables. A file-group table reaching one of
    * these fails loudly — its every commit already merges and lays out
    * its buckets, so "compacting" it is a category error the dangling
    * `v<id>` read would otherwise surface as a confusing missing-path
    * crash. */
  private def requireMorLayout(spark: SparkSession, dir: String, proc: String): Unit =
    FileGroups.committedId(spark, dir).foreach { id =>
      if (FileGroups.hasManifest(spark, dir, id))
        throw new IllegalArgumentException(
          s"$proc serves the MOR/versioned-snapshot layout; $dir is a FILE-GROUP " +
            "table, whose commits merge and lay out their buckets already — use " +
            "clean/purge_keys/rollback for its maintenance")
    }

  /** Comma-separated column-list argument with a declared default of ''
    * = "use the catalog's configured columns" (the same fallback rule
    * as the catalog's pre-header tables). */
  private def colsArg(input: InternalRow, pos: Int, proc: String, arg: String,
                      dflt: Seq[String]): Seq[String] = {
    require(!input.isNullAt(pos),
      s"$proc: '$arg' must be a comma-separated column list, or omitted for the default")
    val cols = input.getUTF8String(pos).toString
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (cols.nonEmpty) cols else dflt
  }

  /** `CALL c.run_compaction(table[, record_keys, ord])` — MOR compaction
    * as a table service (Hudi's `run_compaction` procedure): fold every
    * pending log delta into a new base version. A thin binding over
    * [[graft.cdc.MergeOnRead.compact]] — the same crash-safe fold
    * (pin → merge → marker → log GC, FS-locked when enabled) as the
    * Scala door; this adds argument resolution only, so the two doors
    * cannot diverge. `record_keys`/`ord` default to the catalog's
    * keys/ord conf (the MOR layout has no self-describing manifest).
    * Returns (version = the new base id, applied) — applied=false when
    * nothing was pending. */
  private final class RunCompaction(spark: => SparkSession, root: => String,
                                    keys: => Seq[String], ord: => Seq[String])
      extends FgProcedure(spark, root) {
    override def name(): String = "run_compaction"
    override def description(): String =
      "fold a MOR table's pending log deltas into a new base version"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType),
        ProcedureParameter.in("record_keys", StringType).defaultValue("''").build(),
        ProcedureParameter.in("ord", StringType).defaultValue("''").build())

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val table = tableArg(input)
      val dir = s"$root/$table"
      // a MOR table is addressable BEFORE its first compaction (log
      // deltas only, no base `_COMMIT_`) — the file-group resolveTable
      // would reject exactly the table this service exists to serve
      if (FileGroups.committedId(session, dir).isEmpty &&
          graft.cdc.MergeOnRead.deltaIds(session, dir).isEmpty)
        throw new IllegalArgumentException(
          s"no MOR table '$table' under $root (no base version, no pending log deltas)")
      requireMorLayout(session, dir, "run_compaction")
      val k = colsArg(input, 1, "run_compaction", "record_keys", keys)
      val o = colsArg(input, 2, "run_compaction", "ord", ord)
      val folded = graft.cdc.MergeOnRead.compact(session, dir, k, o)
      result(serviceOutcome,
        Seq(InternalRow(folded.map(java.lang.Long.valueOf).orNull, folded.isDefined)))
    }
  }

  /** `CALL c.run_clustering(table, sort_by[, files])` — the clustering
    * REPLACE commit as a table service (Hudi's `run_clustering`
    * procedure): rewrite the current base version range-sorted on
    * `sort_by` (comma-separated columns) into `files` min/max-disjoint
    * files, via [[graft.cdc.Clustering.cluster]] — the same marker
    * protocol and GC as the Scala door. Returns (version = the
    * clustered base id, applied) — applied=false when the head is
    * already clustered. */
  private final class RunClustering(spark: => SparkSession, root: => String)
      extends FgProcedure(spark, root) {
    override def name(): String = "run_clustering"
    override def description(): String =
      "rewrite a snapshot/MOR table's base version range-sorted into min/max-disjoint files"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType), in("sort_by", StringType),
        ProcedureParameter.in("files", LongType).defaultValue("8").build())

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val table = tableArg(input)
      val dir = s"$root/$table"
      if (FileGroups.committedId(session, dir).isEmpty)
        throw new IllegalArgumentException(
          s"no committed base version of '$table' under $root — clustering rewrites " +
            "a base; compact (or commit) first")
      requireMorLayout(session, dir, "run_clustering")
      require(!input.isNullAt(1), "run_clustering: 'sort_by' must not be NULL")
      val sortBy = input.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(sortBy.nonEmpty,
        "run_clustering: 'sort_by' needs at least one column name")
      require(!input.isNullAt(2), "run_clustering: 'files' must not be NULL")
      val files = input.getLong(2)
      require(files >= 1 && files <= 100000,
        s"run_clustering: 'files' must be between 1 and 100000; got $files")
      val clustered = graft.cdc.Clustering.cluster(session, dir,
        sortBy.map(org.apache.spark.sql.functions.col), files.toInt)
      result(serviceOutcome,
        Seq(InternalRow(clustered.map(java.lang.Long.valueOf).orNull, clustered.isDefined)))
    }
  }

  /** `CALL c.purge_keys(table, keys)` — right-to-be-forgotten through
    * SQL: [[FileGroups.purgeKeyTuples]] with the next version id — the
    * keys leave the CURRENT state and every retained historical version
    * (manifests, savepoints, unreferenced data dropped), rewriting only
    * the file groups the manifest index admits for the purged keys.
    * Crash-safe via the `_PURGE_` intent marker like every Scala-side
    * purge. The `keys` parameter is `array<string>` so ONE procedure
    * serves integer AND string (UUID) record keys — each element is
    * cast to the table's committed key type before hashing (ANSI store
    * assignment coerces an `array(1, 2)` argument transparently);
    * composite-key tables purge through the Scala door's tuple API.
    * Returns the rewritten bucket ids. */
  private final class PurgeKeys(spark: => SparkSession, root: => String,
                                keys: => Seq[String])
      extends FgProcedure(spark, root) {
    override def name(): String = "purge_keys"
    override def description(): String =
      "hard-delete record keys from the current state AND all retained history"
    override def parameters(): Array[ProcedureParameter] =
      Array(in("table", StringType), in("keys", ArrayType(StringType, containsNull = false)))

    private val schema = StructType(Seq(
      StructField("rewritten_bucket", LongType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val (dir, id) = resolveTable(tableArg(input))
      val purge = input.getArray(1).toObjectArray(StringType)
        .map(v => Seq[Any](v.toString)).toSeq
      require(purge.nonEmpty, "purge_keys needs at least one key")
      // manifest-recorded key columns win over the catalog conf (the
      // same self-describing rule as the catalog's loadTable)
      val tableKeys = FileGroups.tableKeyConfig(session, dir).flatMap(_._1).getOrElse(keys)
      require(tableKeys.size == 1,
        "purge_keys takes one value per key — composite-key tables purge " +
          "through FileGroups.purgeKeyTuples")
      val buckets = FileGroups.purgeKeyTuples(session, dir, tableKeys, purge, id + 1)
      result(schema, buckets.toSeq.sorted.map(InternalRow(_)))
    }
  }
}
