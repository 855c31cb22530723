package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.{ByteType, DateType, Decimal, DecimalType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.FileGroups

/** The catalog read path's scan builder: Spark's OWN
  * [[ParquetScanBuilder]] (full column pruning, filter pushdown,
  * row-group skipping — nothing reimplemented) over the manifest's
  * referenced bucket dirs, plus ONE override: `build()` inspects the
  * pushed data filters for record-key equality/IN probes and, when
  * found, swaps the file index for one holding only the file groups
  * the manifest index (hash bucket + stats + key bloom) admits —
  * [[FileGroups.pointLookupTuples]]'s metadata pruning surfacing in
  * SQL plans, for EVERY record-key shape: integer keys, string (UUID)
  * keys, and composite keys (each key column equality-constrained →
  * the cross product of the per-column literal lists is the candidate
  * tuple set). The pruning is a conservative superset cut and the key
  * predicate stays in the scan's pushed filters, so results are exact
  * either way. Non-key predicates, ranges, and probe sets wider than
  * [[FileGroupScanBuilder.MaxProbes]] fall back to the full
  * referenced-file scan unchanged. */
class FileGroupScanBuilder private (
    sparkSes: SparkSession,
    dir: String,
    version: Long,
    keys: Seq[String],
    tableSchema: StructType,
    allFiles: InMemoryFileIndex,
    basePaths: Seq[String],
    options: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(sparkSes, allFiles, tableSchema, tableSchema, options) {

  /** Whether key column `k`'s COMMITTED type is the default
    * (UTF8_BINARY) StringType. String probes are admitted only then:
    * checking the literal's collation alone would be unsound if the
    * key column carried a non-binary collation and Spark's collation
    * coercion compared a default-collation literal under the COLUMN's
    * collation without a cast node — `id = 'U5'` would match row 'u5',
    * but the index hashed 'u5' bytewise, and the probe would prune
    * away the very group holding the match. */
  private def keyIsBinaryString(k: String): Boolean =
    tableSchema.fields.find(f => sparkSes.sessionState.conf.resolver(f.name, k))
      .exists(_.dataType == StringType)

  /** A pushable probe literal for key column `k`: int family
    * (normalized to Long — the probe resolver casts to the committed
    * key type with round-trip validation anyway), BINARY-equality
    * strings (both literal AND committed column must be the default
    * UTF8_BINARY collation — see [[keyIsBinaryString]]), and the
    * Debezium-real decimal / date / timestamp key literals (numeric
    * and temporal PKs), converted to the driver-side value space the
    * probe resolver types from. TimestampNTZ stays excluded (no
    * driver-side inference mapping) and falls back to the unpruned
    * referenced-file scan. */
  private def probeValue(k: String, e: Expression): Option[Any] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    // st == StringType pins the DEFAULT (UTF8_BINARY) collation — the
    // only one whose equality is bytewise like the index hash
    case Literal(v: UTF8String, st: StringType)
      if st == StringType && keyIsBinaryString(k) => Some(v.toString)
    case Literal(v: Decimal, _: DecimalType) => Some(v.toJavaBigDecimal)
    case Literal(v: Int, DateType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(v))
    case Literal(v: Long, TimestampType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(v))
    case _ => None
  }

  /** The canonical key-column name `e` references, if any. */
  private def keyOf(e: Expression): Option[String] = e match {
    case a: AttributeReference =>
      keys.find(sparkSes.sessionState.conf.resolver(_, a.name))
    case _ => None
  }

  /** One pushed conjunct's (key column, probe literals), if the WHOLE
    * conjunct converts: `Some(k, vs)` only when every element is a
    * convertible literal — an IN list with a non-literal entry (`id IN
    * (5, other_col)`) returns None so that conjunct contributes NO
    * pruning (a partial literal subset would prune away file groups
    * holding rows that match the dropped entry — silent wrong
    * results). */
  private def conjunctProbes(e: Expression): Option[(String, Seq[Any])] = e match {
    case EqualTo(a, l) if keyOf(a).isDefined =>
      probeValue(keyOf(a).get, l).map(v => (keyOf(a).get, Seq(v)))
    case EqualTo(l, a) if keyOf(a).isDefined =>
      probeValue(keyOf(a).get, l).map(v => (keyOf(a).get, Seq(v)))
    case EqualNullSafe(a, l) if keyOf(a).isDefined =>
      probeValue(keyOf(a).get, l).map(v => (keyOf(a).get, Seq(v)))
    case EqualNullSafe(l, a) if keyOf(a).isDefined =>
      probeValue(keyOf(a).get, l).map(v => (keyOf(a).get, Seq(v)))
    case In(a, vs) if keyOf(a).isDefined =>
      val k = keyOf(a).get
      val ps = vs.map(probeValue(k, _))
      if (ps.nonEmpty && ps.forall(_.isDefined)) Some((k, ps.flatten)) else None
    case _ => None
  }

  /** Candidate key TUPLES from the PUSHED data filters (catalyst side —
    * populated by FileScanBuilder.pushFilters before build()).
    * Conjuncts are ANDed, so per key column the INTERSECTION of its
    * fully-converted conjuncts' lists is the tightest sound literal
    * set, and partially-converted conjuncts are discarded wholesale
    * (never used as a subset). A tuple set exists only when EVERY key
    * column is equality-constrained (`k1 = 5 AND k2 IN ('a','b')` →
    * tuples (5,'a'),(5,'b') — any matching row's tuple must lie in the
    * cross product, so the cut is sound); a missing column, an empty
    * intersection (contradictory conjuncts — Spark's own filters
    * already return zero rows), or a cross product past
    * [[FileGroupScanBuilder.MaxProbes]] yields Nil = no pruning. */
  private def keyProbes: Seq[Seq[Any]] = {
    val perCol: Map[String, Seq[Seq[Any]]] =
      dataFilters.flatMap(conjunctProbes).groupMap(_._1)(_._2.distinct)
    val colLists: Map[String, Seq[Any]] =
      perCol.view.mapValues(_.reduce(_ intersect _)).toMap
    if (!keys.forall(k => colLists.get(k).exists(_.nonEmpty))) Nil
    else {
      val lists = keys.map(colLists)
      if (lists.map(_.size.toLong).product > FileGroupScanBuilder.MaxProbes) Nil
      else lists.foldLeft(Seq(Seq.empty[Any])) { (acc, l) =>
        acc.flatMap(t => l.map(t :+ _))
      }
    }
  }

  override def build(): ParquetScan = {
    val base = super.build()
    val probes = keyProbes
    if (probes.isEmpty) base
    else {
      // probe pruning composes with the builder's baseline file set
      // (possibly already cut to changed-since-version file groups):
      // intersect, never replace — a probe admitting a bucket the
      // incremental cut excluded must not resurrect it
      val paths = FileGroups.referencedPaths(sparkSes, dir, version, keys, probes)
        .filter(basePaths.toSet)
      base.copy(fileIndex = FileGroupScanBuilder.index(sparkSes, paths, tableSchema))
    }
  }
}

object FileGroupScanBuilder {

  /** Probe-list cap: past this an IN list (or a composite cross
    * product) is scan-shaped, not lookup-shaped, and the full
    * referenced-file scan with parquet row-group skipping wins over
    * per-probe bucket resolution. */
  val MaxProbes = 256

  /** Internal read option ([[IncrementalReadRule]] plants it after
    * consuming the public `startingVersion`): restrict the scan's file
    * set to the file groups REWRITTEN after this version — Hudi's
    * incremental file cut. Rows carried forward inside rewritten
    * groups are dropped by the rule's ord-threshold filter; untouched
    * groups never reach the scan at all, so the incremental read costs
    * O(changed buckets), not O(table), at any size. */
  val IncrementalFromOpt = "__graft_incremental_from"

  private[sources] def index(spark: SparkSession, paths: Seq[String],
                             schema: StructType): InMemoryFileIndex =
    new InMemoryFileIndex(spark, paths.map(new Path(_)), Map.empty[String, String],
      Some(schema), FileStatusCache.getOrCreate(spark), None, None)

  def apply(spark: SparkSession, dir: String, version: Long, keys: Seq[String],
            schema: StructType, options: CaseInsensitiveStringMap): FileGroupScanBuilder = {
    val paths = Option(options.get(IncrementalFromOpt)).map(_.toLong) match {
      case Some(fromV) => FileGroups.changedReferencedPaths(spark, dir, fromV, version)
      case None => FileGroups.referencedPaths(spark, dir, version, keys, Nil)
    }
    new FileGroupScanBuilder(spark, dir, version, keys, schema,
      index(spark, paths, schema), paths, options)
  }
}
