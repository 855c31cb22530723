package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThan, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.{FileGroups, Ingest}

/** STREAMING incremental source over the file-group CDC store — the
  * continuous form of the `startingVersion` batch read option
  * ([[IncrementalReadRule]]) and the last leg of the reference's
  * pipeline (README.md:298-307: the DeltaStreamer table exists so
  * DOWNSTREAM consumers can keep pulling "what changed since my last
  * read"; Hudi ships this as the incremental streaming read, Delta as
  * `readStream` with CDF):
  *
  * {{{
  * spark.readStream.format("graft-cdc")
  *   .option("startingVersion", 0)      // or "earliest" / "latest" (default)
  *   .load("/warehouse/cdc/employees")
  * }}}
  *
  * Offsets ARE table versions: each micro-batch (va → vb] is exactly
  * the batch door's bounded incremental cut — version vb's snapshot
  * restricted to rows whose latest write landed after retained version
  * va, post-image rows, deletes absent (the non-CDC incremental view;
  * a consumer needing before/after images replays ranges through the
  * `graft_table_changes` TVF). Semantics therefore reuse the batch
  * rule's two ingredients verbatim, so the doors cannot diverge:
  *
  *  - THRESHOLD: version va's `#ordhi` manifest header — ONE metadata
  *    line, pushed to parquet for row-group skipping AND re-checked
  *    exactly per row in the reader wrapper (a pushed parquet filter
  *    alone is stats-granular, not exact). Pre-r19 manifests fall back
  *    to one driver-side max(ord) job over version va's files, ord
  *    column only — paid once per batch, only on legacy tables.
  *  - FILE CUT: only file groups REWRITTEN in (va, vb] reach the scan
  *    ([[FileGroups.changedReferencedPaths]] — manifest set-difference,
  *    zero data IO); untouched buckets carry forward by reference and
  *    cannot hold changed rows. Per-batch planning reads exactly TWO
  *    manifests (va and vb) — O(1) per batch over any timeline length,
  *    never O(versions).
  *
  * DERIVED TABLES (the incremental-ETL / medallion hop): foreachBatch
  * over this stream + [[graft.cdc.FileGroups.commitStreamBatch]] into
  * a downstream file-group table maintains a transform of the source
  * at changed-rows cost. Deletes don't ride the non-CDC view — the
  * consumer reconciles each pulled RANGE through the change-feed diff
  * (per range, never endpoint-to-endpoint: a key created and deleted
  * inside the total range is invisible to one big diff but was
  * upserted by its batch), committing the range's 'd' keys with the
  * range's own `#ordhi` as their ord so a later re-create still wins.
  * IncrementalStreamSpec's "medallion hop" case pins the whole
  * composition to exact equality with the transformed head.
  *
  * The same monotone-precombine assumption as the batch rule, stated
  * loudly there (IncrementalRead.scala): the ordering column must be
  * globally monotone across commits (the Debezium LSN / commit-time
  * shape). An aged-out START or batch BASE fails loudly with the
  * re-bootstrap hint — the stream never silently diffs against the
  * wrong base; likewise a table rolled back below the stream's
  * checkpointed position. The read schema is pinned at stream start
  * (DSv2 fixes it before offsets exist); columns added by a later
  * ALTER surface after a restart.
  *
  * Scale: per trigger = two manifest reads + a parquet scan of the
  * changed file groups with the ord predicate pushed — the same plan
  * shape PLANS.md pins for the batch option, dressed as a stream.
  */
class GraftCdcStreamProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def tableOf(options: CaseInsensitiveStringMap): GraftCdcStreamTable = {
    val dir = Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "the graft-cdc stream source needs the table directory: " +
        "spark.readStream.format(\"graft-cdc\").load(<dir>)"))
    new GraftCdcStreamTable(SparkSession.active, dir)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableOf(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    tableOf(new CaseInsensitiveStringMap(properties))
}

/** The streaming face of one file-group table: schema pinned from the
  * head manifest at resolution, MICRO_BATCH_READ only (batch reads go
  * through the `graft_cdc` catalog / `FileGroups.read`). */
private[sources] class GraftCdcStreamTable(spark: SparkSession, dir: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft-cdc `$dir`"

  override lazy val schema: StructType = {
    val head = FileGroups.committedId(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed file-group table at $dir — the graft-cdc stream source reads " +
          "the store FileGroups.commit/commitStreamBatch maintain"))
    FileGroups.manifestSchema(spark, dir, head).getOrElse(throw new IllegalStateException(
      s"manifest v$head at $dir carries no schema — pre-schema-header table; rebuild"))
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val pinned = schema
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = pinned
        override def toBatch: Batch = throw new UnsupportedOperationException(
          s"graft-cdc is a STREAMING source; batch reads of $dir go through the " +
            "graft_cdc catalog (spark.read.table, optionally with startingVersion) " +
            "or FileGroups.read")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftCdcMicroBatchStream(spark, dir, pinned, options)
      }
    }
  }
}

/** One version offset; `json` is the bare version id. */
private[sources] case class VersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[sources] class GraftCdcMicroBatchStream(
    spark: SparkSession, dir: String, schema: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Ordering column, resolved from the self-describing manifest (the
    * same trust rule as the catalog — never from caller config). */
  private val ord: String = FileGroups.tableKeyConfig(spark, dir).flatMap(_._2) match {
    case Some(Seq(one)) => one
    case Some(other) => throw new IllegalArgumentException(
      s"the graft-cdc stream source needs exactly one ordering column on $dir to " +
        s"decide changed-since, found ${other.mkString(", ")} — replay ranges through " +
        "graft_table_changes instead")
    case None => throw new IllegalArgumentException(
      s"table at $dir records no ordering columns (pre-r17 manifest) — rewrite the " +
        "table (any commit re-records #ord) before streaming incrementally from it")
  }
  private val ordIdx: Int = schema.fields.indexWhere(
    f => spark.sessionState.conf.resolver(f.name, ord))
  require(ordIdx >= 0, s"ordering column '$ord' not in $dir's schema — manifest drift")
  private val ordType: DataType = schema.fields(ordIdx).dataType
  require(Seq(LongType, IntegerType, ShortType, ByteType).contains(ordType),
    s"ordering column '$ord' of $dir is $ordType — the incremental threshold needs " +
      "an integer-family ordering column (the Debezium LSN shape)")

  private def retained: Seq[Long] = Ingest.snapshotVersions(spark, dir)

  private def head: Long = FileGroups.committedId(spark, dir).getOrElse(
    throw new IllegalStateException(
      s"file-group table at $dir lost its committed versions mid-stream"))

  /** Validate an incremental BASE version (stream start or a batch's
    * lower bound): still retained, no standing purge intent. */
  private def requireRetainedBase(v: Long, role: String): Unit = {
    FileGroups.assertNoPurgeResurrection(spark, dir, v)
    val r = retained
    if (!r.contains(v))
      throw new IllegalArgumentException(
        s"$role version $v of $dir is not retained (retained: ${r.mkString(", ")}) — " +
          "the incremental base aged out (cleaner) or the table was rolled back; " +
          "the consumer must re-bootstrap from a full snapshot read and a fresh " +
          "checkpoint")
  }

  override def initialOffset(): Offset = {
    val start = Option(options.get("startingVersion")).map(_.trim.toLowerCase) match {
      case None | Some("latest") => head // stream only future commits
      case Some("earliest") => retained.minOption.getOrElse(throw new IllegalStateException(
        s"file-group table at $dir has no retained versions — nothing to stream from"))
      case Some(s) =>
        val v = s.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"stream option startingVersion='$s' must be an integer version id, " +
            "'earliest' or 'latest'"))
        require(v <= head,
          s"startingVersion $v is beyond the committed head $head of $dir")
        requireRetainedBase(v, "startingVersion")
        v
    }
    VersionOffset(start)
  }

  /** Per-trigger admission (Hudi's read-limit role): an unbounded
    * catch-up — `startingVersion=earliest` against a long retained
    * timeline, or a stream restarted after days down — would land the
    * WHOLE backlog as one micro-batch. `maxVersionsPerTrigger = N`
    * bounds each batch to the next N retained versions' cut; the
    * stream walks the timeline version-window by version-window until
    * caught up. Default unbounded (Spark's own trigger pacing). */
  private val maxVersionsPerTrigger: Option[Int] =
    Option(options.get("maxVersionsPerTrigger")).map { s =>
      s.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"stream option maxVersionsPerTrigger='$s' must be a positive integer"))
    }

  // Spark routes admission-control sources through latestOffset(start,
  // limit); the no-arg form stays as the uncapped answer so any
  // engine path that still consults it sees a correct (if unbounded)
  // offset rather than an error
  override def latestOffset(): Offset = VersionOffset(head)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val h = head
    maxVersionsPerTrigger match {
      case None => VersionOffset(h)
      case Some(n) =>
        val va = start.asInstanceOf[VersionOffset].version
        if (h <= va) VersionOffset(h)
        else {
          // the N-th next RETAINED version (aged-out intermediates
          // cannot be a batch target — their manifests are gone; the
          // cut between surviving versions composes exactly)
          val next = retained.filter(v => v > va && v <= h).take(n)
          VersionOffset(if (next.isEmpty) h else next.last)
        }
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val va = start.asInstanceOf[VersionOffset].version
    val vb = end.asInstanceOf[VersionOffset].version
    if (vb == va) return Array.empty
    if (vb < va)
      throw new IllegalStateException(
        s"table at $dir moved BACKWARDS under the stream (checkpointed position $va, " +
          s"committed head $vb) — a rollback below the stream's position; restart " +
          "from a fresh checkpoint after re-bootstrapping the consumer")
    requireRetainedBase(va, "incremental base")
    requireRetainedBase(vb, "batch target") // a stream lagged past the cleaner
    val paths = FileGroups.changedReferencedPaths(spark, dir, va, vb)
    if (paths.isEmpty) return Array.empty

    // the threshold: #ordhi metadata (r19+), else ONE driver-side
    // max(ord) job over version va's files, ord column only (pre-r19).
    // None = the base snapshot is EMPTY (no files, or a NULL max) —
    // then EVERY head row has changed since, NULL-ord rows included,
    // exactly the batch rule's `IsNull(threshold) OR ord > threshold`
    // fallback (IncrementalRead). A Long.MinValue sentinel here would
    // silently drop NULL-ord rows the batch door serves — the two
    // doors must not diverge.
    val threshold: Option[Long] = FileGroups.manifestOrdHi(spark, dir, va).orElse {
      val vaPaths = FileGroups.referencedPaths(spark, dir, va, Nil, Nil)
      if (vaPaths.isEmpty) None // empty base: everything has changed since
      else {
        val m = spark.read.parquet(vaPaths: _*)
          .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col(ord)))
          .head()
        if (m.isNullAt(0)) None
        else m.get(0) match { case n: Number => Some(n.longValue()) }
      }
    }

    // Spark's own parquet scan over ONLY the changed file groups, the
    // threshold pushed for row-group skipping (exactness comes from
    // the per-row re-check in the reader wrapper — pushed parquet
    // filters are stats-granular)
    val builder = new ParquetScanBuilder(spark,
      FileGroupScanBuilder.index(spark, paths, schema), schema, schema,
      CaseInsensitiveStringMap.empty())
    threshold.foreach { thr =>
      val litV: Any = ordType match {
        case LongType => thr
        case IntegerType => thr.toInt
        case ShortType => thr.toShort
        case ByteType => thr.toByte
      }
      builder.pushFilters(Seq(GreaterThan(
        AttributeReference(ord, ordType, nullable = true)(),
        Literal.create(litV, ordType))))
    }
    val batch = builder.build().toBatch
    val factory = batch.createReaderFactory()
    batch.planInputPartitions().map(p =>
      GraftCdcInputPartition(p, factory, threshold): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OrdThresholdReaderFactory(ordIdx, ordType)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One delegate parquet partition + the factory that reads it + the
  * batch's exact ord threshold (per-batch state must travel in the
  * partition: the stream-wide reader factory outlives every batch).
  * `threshold = None` means the base was empty — admit every row,
  * NULL ord included (the batch rule's IsNull branch). */
private[sources] case class GraftCdcInputPartition(
    delegate: InputPartition, delegateFactory: PartitionReaderFactory,
    threshold: Option[Long]) extends InputPartition

/** Row-exact changed-since filter over the delegate parquet reader:
  * keep rows with ord > threshold (NULL ord never qualifies — the same
  * SQL semantics as the batch rule's Filter). Row-based deliberately:
  * the filter is one primitive comparison per row, and the delegate's
  * row path is the same codegen'd parquet reader. */
private[sources] class OrdThresholdReaderFactory(ordIdx: Int, ordType: DataType)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdcInputPartition]
    val inner = p.delegateFactory.createReader(p.delegate)
    p.threshold match {
      case None => inner // empty base: every row has changed since — no re-check
      case Some(thr) =>
        new PartitionReader[InternalRow] {
          override def next(): Boolean = {
            while (inner.next()) {
              val row = inner.get()
              if (!row.isNullAt(ordIdx)) {
                val ord = ordType match {
                  case LongType => row.getLong(ordIdx)
                  case IntegerType => row.getInt(ordIdx).toLong
                  case ShortType => row.getShort(ordIdx).toLong
                  case ByteType => row.getByte(ordIdx).toLong
                }
                if (ord > thr) return true
              }
            }
            false
          }
          override def get(): InternalRow = inner.get()
          override def close(): Unit = inner.close()
        }
    }
  }
}
