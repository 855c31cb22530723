package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.FileGroups

/** The catalog read path's scan builder: Spark's OWN
  * [[ParquetScanBuilder]] (full column pruning, filter pushdown,
  * row-group skipping — nothing reimplemented) over the manifest's
  * referenced bucket dirs, plus ONE override: `build()` inspects the
  * pushed data filters for record-key equality/IN probes and, when
  * found, swaps the file index for one holding only the file groups
  * the manifest index (hash bucket + [min,max] stats + key bloom)
  * admits — [[FileGroups.pointLookup]]'s metadata pruning surfacing
  * in SQL plans. The pruning is a conservative superset cut and the
  * key predicate stays in the scan's pushed filters, so results are
  * exact either way. Non-key predicates, ranges, and wide IN lists
  * (> [[FileGroupScanBuilder.MaxProbes]]) fall back to the full
  * referenced-file scan unchanged. */
class FileGroupScanBuilder private (
    sparkSes: SparkSession,
    dir: String,
    version: Long,
    keys: Seq[String],
    tableSchema: StructType,
    allFiles: InMemoryFileIndex,
    options: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(sparkSes, allFiles, tableSchema, tableSchema, options) {

  private def probeValue(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case _ => None
  }

  private def isKey(e: Expression): Boolean = e match {
    case a: AttributeReference =>
      keys.exists(sparkSes.sessionState.conf.resolver(_, a.name))
    case _ => false
  }

  /** One pushed conjunct's key-probe list, if the WHOLE conjunct
    * converts: `Some(vs)` only when every element is a convertible
    * literal — an IN list with a non-literal entry (`id IN (5,
    * other_col)`) returns None so that conjunct contributes NO pruning
    * (a partial literal subset would prune away file groups holding
    * rows that match the dropped entry — silent wrong results). */
  private def conjunctProbes(e: Expression): Option[Seq[Long]] = e match {
    case EqualTo(a, l) if isKey(a) => probeValue(l).map(Seq(_))
    case EqualTo(l, a) if isKey(a) => probeValue(l).map(Seq(_))
    case EqualNullSafe(a, l) if isKey(a) => probeValue(l).map(Seq(_))
    case EqualNullSafe(l, a) if isKey(a) => probeValue(l).map(Seq(_))
    case In(a, vs) if isKey(a) =>
      val ps = vs.map(probeValue)
      if (ps.nonEmpty && ps.forall(_.isDefined)) Some(ps.flatten) else None
    case _ => None
  }

  /** Key probes from the PUSHED data filters (catalyst side — populated
    * by FileScanBuilder.pushFilters before build()). Conjuncts are
    * ANDed, so each FULLY-converted conjunct's list alone bounds the
    * matching keys — the INTERSECTION across converted conjuncts is
    * the tightest sound cut, and partially-converted conjuncts are
    * discarded wholesale (never used as a subset). Empty = no pruning. */
  private def keyProbes: Seq[Long] =
    dataFilters.flatMap(conjunctProbes(_).map(_.distinct)) match {
      case Seq() => Nil
      case lists => lists.reduce(_ intersect _)
    }

  override def build(): ParquetScan = {
    val base = super.build()
    // manifest probe pruning is single-long-key scope (the stats/bloom
    // index); a multi-key catalog config reads correctly via the full
    // referenced-file scan
    val probes = if (keys.size == 1) keyProbes else Nil
    if (probes.isEmpty || probes.size > FileGroupScanBuilder.MaxProbes) base
    else {
      val paths = FileGroups.referencedPaths(sparkSes, dir, version, keys, probes)
      base.copy(fileIndex = FileGroupScanBuilder.index(sparkSes, paths, tableSchema))
    }
  }
}

object FileGroupScanBuilder {

  /** Probe-list cap: past this an IN list is scan-shaped, not
    * lookup-shaped, and the full referenced-file scan with parquet
    * row-group skipping wins over per-probe bucket resolution. */
  val MaxProbes = 256

  private[sources] def index(spark: SparkSession, paths: Seq[String],
                             schema: StructType): InMemoryFileIndex =
    new InMemoryFileIndex(spark, paths.map(new Path(_)), Map.empty[String, String],
      Some(schema), FileStatusCache.getOrCreate(spark), None, None)

  def apply(spark: SparkSession, dir: String, version: Long, keys: Seq[String],
            schema: StructType, options: CaseInsensitiveStringMap): FileGroupScanBuilder = {
    val paths = FileGroups.referencedPaths(spark, dir, version, keys, Nil)
    new FileGroupScanBuilder(spark, dir, version, keys, schema,
      index(spark, paths, schema), options)
  }
}
