package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, GreaterThan, IsNull, Or, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.{FileGroups, Ingest}

/** The `startingVersion` READ OPTION on file-group catalog tables —
  * Hudi's incremental-query ergonomics (reference README.md:300-307
  * context: the DeltaStreamer pipeline exists so downstream consumers
  * can pull "what changed since my last commit" instead of re-reading
  * the table):
  *
  * {{{
  * spark.read.option("startingVersion", 1).table("graft_cdc.employees")
  * }}}
  *
  * Semantics (Hudi's incremental view, post-image rows): the CURRENT
  * snapshot restricted to rows whose latest write landed AFTER
  * retained version `v` — i.e. the upserted rows a downstream job must
  * re-process. Deletes do not appear (their rows are simply absent,
  * as in Hudi's non-CDC incremental query); a consumer that needs
  * before/after images and explicit delete markers uses the
  * `graft_table_changes` TVF instead (sources/TableChanges.scala).
  *
  * Lowering: the relation's schema is UNCHANGED (so this can be a read
  * option at all — DSv2 fixes a table's columns before options are
  * seen), and the plan is `Filter(ord > threshold, head-scan)`. The
  * threshold comes from version v's `#ordhi` manifest header when
  * present (ONE metadata line — zero data IO, and the filter is a
  * plain literal comparison parquet row-group skipping applies); on
  * pre-r19 manifests or non-integer ordering columns it falls back to
  * a lazy 1-row scalar subquery over version v's column-pruned ord
  * scan (no planning-time job either way).
  *
  * CORRECTNESS ASSUMPTION, stated loudly: the precombine/ordering
  * column must be GLOBALLY MONOTONE across commits — true for the
  * Debezium WAL position (`lsn`, the reference's
  * `--source-ordering-field _event_lsn`, README.md:348) and for
  * Hudi's own `_hoodie_commit_time`, the exact analog. A row changed
  * after version v then carries ord greater than EVERY ord retained
  * at v, and an unchanged row's ord is ≤ the version-v maximum. A
  * non-monotone ordering column breaks this equivalence — such tables
  * must use the TVF (which diffs states, assuming nothing).
  *
  * An aged-out `startingVersion` fails loudly with the re-bootstrap
  * hint (never a diff against the wrong base) — the same rule as the
  * TVF. Scale: head scan + one 1-row subquery over version v's
  * referenced files reading only the ord column; no join, no window.
  */
class IncrementalReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val OptKey = "startingVersion"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r @ DataSourceV2Relation(t: FileGroupTable, _, _, _, opts, _)
        if opts.containsKey(OptKey) =>
      val raw = opts.get(OptKey)
      val fromV = raw.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"read option $OptKey='$raw' must be an integer version id"))
      val head = t.snapshotVersion
      require(fromV <= head,
        s"read option $OptKey=$fromV is beyond the read version $head of ${t.name()} — " +
          "nothing can have changed 'since the future'; pass a committed version id")
      // the incremental BASE must still be retained: diffing against a
      // GC'd version would silently misclassify everything that
      // changed between the aged-out base and the oldest survivor
      FileGroups.assertNoPurgeResurrection(spark, t.dir, fromV)
      val retained = Ingest.snapshotVersions(spark, t.dir)
      if (!retained.contains(fromV))
        throw new IllegalArgumentException(
          s"$OptKey $fromV of ${t.name()} is not retained (head: $head, retained: " +
            s"${retained.mkString(", ")}) — an aged-out incremental base means the " +
            "consumer must re-bootstrap from a full snapshot read")
      val ord = t.ordSeq match {
        case Seq(one) => one
        case other => throw new IllegalArgumentException(
          s"$OptKey needs exactly one ordering column on ${t.name()} to decide " +
            s"changed-since, found ${if (other.isEmpty) "none" else other.mkString(", ")} — " +
            "use graft_table_changes for explicit state diffs")
      }
      val resolver = spark.sessionState.conf.resolver
      val ordAttr = r.output.find(a => resolver(a.name, ord)).getOrElse(
        throw new IllegalStateException(
          s"ordering column '$ord' not in ${t.name()}'s schema — manifest/schema drift"))
      // the public option is consumed here (the stripped relation —
      // same output attribute ids, parents above keep resolving —
      // cannot rematch); the INTERNAL option hands the scan builder
      // the incremental FILE cut: only file groups rewritten after
      // fromV reach the scan (Hudi's incremental file pruning —
      // untouched buckets carry forward by manifest reference and
      // cannot hold changed rows), making the read O(changed buckets)
      val stripped = r.copy(options = new CaseInsensitiveStringMap(
        (opts.asCaseSensitiveMap.asScala.filterNot(_._1.equalsIgnoreCase(OptKey)) +
          (FileGroupScanBuilder.IncrementalFromOpt -> fromV.toString)).asJava))
      // THRESHOLD, fast path (r19's #ordhi manifest header): version
      // fromV's ord ceiling is ONE metadata line — the changed-since
      // filter becomes `ord > literal`, zero data IO for the threshold
      // AND a parquet-pushable predicate (row-group skipping on ord).
      // The ceiling may exceed the version's surviving max (it also
      // bounds rows deleted at fromV) — equally correct: no head row
      // carries an ord between the surviving max and the ceiling (such
      // a row would have existed, surviving, at fromV), so both
      // thresholds select the same rows (IncrementalReadProps pins the
      // three-way equivalence).
      FileGroups.manifestOrdHi(spark, t.dir, fromV) match {
        case Some(ceiling) =>
          val litV: Any = ordAttr.dataType match {
            case org.apache.spark.sql.types.LongType => ceiling
            case org.apache.spark.sql.types.IntegerType => ceiling.toInt
            case org.apache.spark.sql.types.ShortType => ceiling.toShort
            case org.apache.spark.sql.types.ByteType => ceiling.toByte
            case other => throw new IllegalStateException(
              s"#ordhi present but ordering column '$ord' is $other — manifest drift")
          }
          Filter(GreaterThan(ordAttr,
            org.apache.spark.sql.catalyst.expressions.Literal.create(litV, ordAttr.dataType)),
            stripped)
        case None =>
          // slow path (pre-r19 manifests / non-integer ord): max(ord)
          // of version fromV's snapshot as a scalar subquery (fresh
          // relation + fresh attribute ids per use; the optimizer's
          // MergeScalarSubqueries folds the two executions). A version
          // whose snapshot is EMPTY (everything deleted) has a NULL
          // max — then everything in the head has changed since.
          def thresholdSubquery(): ScalarSubquery = {
            val tableAtV = new FileGroupTable(spark, s"${t.name()}@v$fromV", t.dir,
              fromV, t.keySeq, t.ordSeq)
            val relV = DataSourceV2Relation.create(tableAtV, None, None,
              CaseInsensitiveStringMap.empty())
            val ordAtV: Attribute = relV.output.find(a => resolver(a.name, ord)).getOrElse(
              throw new IllegalStateException(
                s"ordering column '$ord' not in version $fromV's schema of ${t.name()}"))
            ScalarSubquery(Aggregate(Nil,
              Seq(Alias(Max(ordAtV).toAggregateExpression(), "graft_max_ord")()), relV))
          }
          Filter(Or(IsNull(thresholdSubquery()),
            GreaterThan(ordAttr, thresholdSubquery())), stripped)
      }
  }
}
