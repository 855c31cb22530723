package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.GraftPlanBuilder
import org.apache.spark.sql.execution.{BinaryExecNode, SparkStrategy, SparkPlan}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native AS-OF join — the one operator in the surface where Spark has
  * no physical primitive at all (reference semantics: "latest right row
  * at or before each left row's timestamp, per key" — the q_join_asof
  * contract). The composed forms both pay something structural:
  *   - range join + per-left dedup window: pair EXPANSION before the
  *     dedup — a hot key with n lefts and m rights materializes n·m
  *     join rows only to keep n (quadratic per key, skew-dominated);
  *   - union + carry-forward window (what q_join_asof ships): linear
  *     and the right default, but it buffers BOTH inputs through one
  *     window partition and loses the sides' separate schemas (every
  *     column of both sides rides the union row).
  * This is the (c) tier done properly: a logical node, a planner
  * strategy, and a physical [[AsOfMergeJoinExec]] that declares
  * ClusteredDistribution + (key, ts) ordering so Catalyst plans ONE
  * co-partitioning exchange + sort per side, then streams both sorted
  * iterators through a zero-buffer per-partition merge: each input row
  * is touched once, the only per-key state is the single last-seen
  * right row. At 100 TB that is the minimum possible: no pair
  * expansion, no union materialization, memory O(1) per partition.
  *
  * Semantics: left rows are all kept (left-outer); match = last right
  * row with equal keys and rightTs <= leftTs (or strictly < when
  * `allowExactMatches = false` — the merge_asof strict-inequality
  * mode), ties among equal (key, ts) broken by `rightTies` ascending
  * (last wins — mirror of the union-window form's carried-value rule).
  * Null timestamps never match and null-ts right rows are skipped.
  * NULL JOIN KEYS group
  * together (window-PARTITION semantics, deliberately identical to
  * the composed union-window form) rather than SQL equi-join's
  * null-never-matches — callers needing equi-join null behavior
  * filter null keys first. Timestamp/date/integral ts types only
  * (micros/days/long compare as long).
  *
  * Registered per-session (idempotent) via `experimental.
  * extraStrategies`; `AsOfJoin.asof(...)` is the user API.
  * AsOfJoinSpec pins: value-equality with the union-window
  * formulation on the events table, the exec node + exactly one
  * exchange per side in the plan, and the null-extension case.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression],
    tolerance: Option[Long],
    allowExact: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] cost-based, the SMJ-vs-BHJ decision for
  * as-of: a right side under the session's autoBroadcastJoinThreshold
  * (by logical stats) goes to [[BroadcastAsOfJoinExec]] — the LEFT
  * side is never shuffled at all, which at 100 TB is the difference
  * between a narrow enrich pass and exchanging the fact table — and
  * everything else takes the co-partitioned [[AsOfMergeJoinExec]].
  * Other nodes fall through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, ties, tol, exact) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, ties, tol, exact) :: Nil
      else
        AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, ties, tol, exact) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression],
    tolerance: Option[Long],
    allowExact: Boolean) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // co-partition on the join keys; EnsureRequirements inserts the one
  // exchange per side (or reuses an existing compatible partitioning)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sorted (key, ts[, ties]) within each partition; the merge consumes
  // both iterators monotonically
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTs) ++ rightTies).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: Number => n.longValue()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsBound = BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      // bind against NULLABLE right attributes: the unmatched null-row
      // branch needs the generated projection to isNullAt-check the
      // right side, or nulls read back as zeros
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      val tol = tolerance
      val exact = allowExact
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _           // unconsumed right row
        private var lastMatch: InternalRow = _       // copied last candidate
        private var lastMatchKey: InternalRow = _    // its copied key
        private var lastMatchTs: Long = _            // its ts (for tolerance)
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lT = lTsBound.eval(l)
          // consume rights with smaller keys, and same-key rights whose
          // ts is null (skipped) or <= leftTs (strictly < in
          // allowExact=false mode — an equal-ts right stays unconsumed:
          // left rows arrive ts-ascending, so it can still match a
          // LATER left with a strictly larger ts) — those become the
          // carried candidate
          var advancing = true
          while (advancing && (rHead != null || rIter.hasNext)) {
            if (rHead == null) rHead = rIter.next()
            val rKey = rKeyProj(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) rHead = null // discard: behind every future left too
            else if (c == 0) {
              val rT = rTsBound.eval(rHead)
              if (rT == null) rHead = null // never a match, step over
              else if (lT != null &&
                  (if (exact) asLong(rT) <= asLong(lT) else asLong(rT) < asLong(lT))) {
                lastMatch = rHead.copy()
                lastMatchKey = rKey.copy()
                lastMatchTs = asLong(rT)
                rHead = null
              } else advancing = false // future left rows may want it
            } else advancing = false // right is ahead: keep for later keys
          }
          // tolerance bounds the lag: the LATEST candidate being too old
          // means every earlier one is older still, so a single check on
          // the carried candidate is complete
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0 &&
            (tol.isEmpty || (lT != null && asLong(lT) - lastMatchTs <= tol.get))
          outProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of: the small right side is collected on the driver
  * into a per-key TS-SORTED array map (sorted by the required (key,
  * ts, ties) ordering semantics), broadcast once, and every left
  * partition binary-searches it — the left takes NO exchange, NO sort,
  * so the plan over a 100 TB fact table is one narrow pass. Chosen by
  * [[AsOfJoinStrategy]] when right's stats fit under
  * autoBroadcastJoinThreshold; semantics identical to
  * [[AsOfMergeJoinExec]] (AsOfJoinSpec pins equality on both paths).
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression],
    tolerance: Option[Long],
    allowExact: Boolean) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: Number => n.longValue()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    // driver-side build: right is threshold-bounded by the strategy.
    // executeCollect yields compact UnsafeRows; per key we keep two
    // PARALLEL arrays (primitive long[] timestamps + row refs) rather
    // than boxed (Long, row) tuples, so the broadcast payload is the
    // rows plus one primitive array — no per-entry tuple/box overhead.
    val rRows = right.executeCollect()
    val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
    val rTsBound = BindReferences.bindReference(rightTs, rOut)
    val tieOrder = RowOrdering.createNaturalAscendingOrdering(rightTies.map(_.dataType))
    val tieProj = UnsafeProjection.create(rightTies, rOut)
    val byKey: Map[InternalRow, (Array[Long], Array[InternalRow])] = rRows.toSeq
      .flatMap { r =>
        Option(rTsBound.eval(r)).map(t => (rKeyProj(r).copy(), asLong(t), r.copy()))
      }
      .groupBy(_._1)
      .map { case (k, vs) =>
        // sort by (ts, ties) ascending — last-wins at emit mirrors the
        // merge exec's carried-candidate rule
        val sorted = vs.sortWith { (a, b) =>
          if (a._2 != b._2) a._2 < b._2
          else tieOrder.compare(tieProj(a._3).copy(), tieProj(b._3).copy()) < 0
        }
        k -> (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      }
    val bc = sparkContext.broadcast(byKey)
    val tol = tolerance
    val exact = allowExact
    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTsBound = BindReferences.bindReference(leftTs, lOut)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val m = bc.value
      lIter.map { l =>
        val lT = lTsBound.eval(l)
        val hit: InternalRow =
          if (lT == null) null
          else m.get(lKeyProj(l)) match {
            case None => null
            case Some((ts, rows)) =>
              // binary search: last index with ts <= lT (< when exact
              // matches are disallowed — the merge_asof strict mode)
              val t = asLong(lT)
              var lo = 0; var hi = ts.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (if (exact) ts(mid) <= t else ts(mid) < t) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0) null
              else if (tol.exists(w => t - ts(ans) > w)) null
              else rows(ans)
          }
        outProj(joined(l, if (hit != null) hit else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User API + per-session strategy registration. */
object AsOfJoin {

  private val tsTypes =
    Set[org.apache.spark.sql.types.DataType](
      LongType, IntegerType, TimestampType, TimestampNTZType, DateType)

  /** Idempotently register the planner strategy on this session (the
    * driver owns session construction, so `spark.sql.extensions` isn't
    * available — runtime registration is the supported second door). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** AS-OF join `left` to the latest `right` row per key with
    * `rightTs <= leftTs` (left-outer; ties by `rightTies`, last wins).
    * `allowExactMatches = false` switches to the merge_asof strict
    * mode: `rightTs < leftTs`, an equal-timestamp right row is never a
    * match. `tolerance` (same unit as the ts columns — micros for
    * timestamps) additionally requires `leftTs - rightTs <= tolerance`,
    * the merge_asof bounded-lag contract: a stale quote/click older
    * than the window is no match at all. Column names resolve against
    * each side's output honoring `spark.sql.caseSensitive` (default
    * case-insensitive, like the rest of the analyzer) and throw on
    * ambiguity — pre-alias before joining (the spec shows the
    * pattern). */
  def asof(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTs: String, rightTs: String,
           rightTies: Seq[String] = Nil,
           tolerance: Option[Long] = None,
           allowExactMatches: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def att(p: LogicalPlan, n: String): Attribute = {
      val hits = p.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      hits match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"asof: column $n not in [${p.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"asof: column $n is ambiguous (${many.size} matches) — alias the side first")
      }
    }
    val lts = att(lp, leftTs); val rts = att(rp, rightTs)
    require(tsTypes.contains(lts.dataType) && lts.dataType == rts.dataType,
      s"asof: ts columns must share an integral/timestamp type, " +
        s"got ${lts.dataType} vs ${rts.dataType}")
    require(leftKeys.map(att(lp, _).dataType) == rightKeys.map(att(rp, _).dataType),
      "asof: key column types must match pairwise")
    require(tolerance.forall(_ >= 0), "asof: tolerance must be >= 0")
    GraftPlanBuilder.ofRows(spark, AsOfJoinPlan(lp, rp,
      leftKeys.map(att(lp, _)), rightKeys.map(att(rp, _)),
      lts, rts, rightTies.map(att(rp, _)), tolerance, allowExactMatches))
  }
}
