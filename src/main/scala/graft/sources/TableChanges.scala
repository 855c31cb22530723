package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.{ChangeFeed, FileGroups, Ingest}

/** `SELECT * FROM graft_table_changes('<catalog>.<table>', v1, v2)` —
  * the SQL door on the incremental change feed, the Hudi-family
  * consumer shape the reference's downstream jobs run ("give me what
  * changed since my last pull" instead of a full re-read,
  * README.md:300-307; Hudi ships the same surface as the
  * `hudi_table_changes` TVF, Delta as `table_changes`).
  *
  * A TABLE-VALUED function, not a procedure: a change feed is DATA
  * (at 100 TB potentially millions of changed keys), so it must come
  * back as a distributed plan SQL composes over — `WHERE change_op =
  * 'd'`, joins, aggregations — never as driver-side procedure rows.
  * The plan is [[ChangeFeed.diff]]'s ONE full-outer shuffle join of
  * the two RETAINED versions' manifest-resolved snapshots on the
  * record key; both sides are file-group tables bucketed on that key.
  *
  * Output: key columns, `change_op` ('i'/'u'/'d'), then
  * `before_<c>`/`after_<c>` images for the ordering column and every
  * carried data column (the manifest schema minus keys). Versions must
  * both be retained (current, prior, or savepointed) — a GC'd `from`
  * version fails loudly with the retained list: the consumer must
  * re-bootstrap from a full snapshot, Hudi's incremental-fallback
  * rule, not silently diff against the wrong base.
  *
  * Registered by [[graft.functions.GraftExtensions]] (session build)
  * or `GraftExtensions.register` (live session). Arguments must be
  * literals: the analyzer resolves the relation's SCHEMA from them at
  * plan time, so there is nothing sound a non-literal could mean.
  */
object TableChangesFunction {

  val ident: FunctionIdentifier = FunctionIdentifier("graft_table_changes")

  val info: ExpressionInfo = new ExpressionInfo(
    TableChangesFunction.getClass.getName.stripSuffix("$"), "graft_table_changes")

  private val usage =
    "graft_table_changes('<catalog>.<table>', <from_version>, <to_version>)"

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, st: StringType) if st == StringType => v.toString
    case other => throw new IllegalArgumentException(
      s"$usage: $what must be a string literal, got ${other.sql}")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$usage: $what must be an integer version literal, got ${other.sql}")
  }

  /** The TVF builder the analyzer calls: resolve the table through its
    * owning FileGroupCatalog's live `root` conf, read both retained
    * versions, and return the analyzed diff plan. */
  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 3, s"$usage takes exactly 3 arguments, got ${args.size}")
    val qualified = strArg(args.head, "the table name")
    val fromV = longArg(args(1), "from_version")
    val toV = longArg(args(2), "to_version")
    val spark = SparkSession.active

    val (cat, table) = qualified.split("\\.") match {
      case Array(c, t) if c.nonEmpty && t.nonEmpty => (c, t)
      case _ => throw new IllegalArgumentException(
        s"$usage: the table name must be '<catalog>.<table>', got '$qualified'")
    }
    // the named catalog must BE a file-group catalog: resolving some
    // other catalog's `root` conf as a file-group warehouse would scan
    // arbitrary directories under a confusing error surface
    val catClass = spark.conf.getOption(s"spark.sql.catalog.$cat").getOrElse(
      throw new IllegalArgumentException(
        s"$usage: no catalog '$cat' is configured (spark.sql.catalog.$cat is unset)"))
    require(catClass == classOf[FileGroupCatalog].getName,
      s"$usage: catalog '$cat' is $catClass, not a ${classOf[FileGroupCatalog].getName}")
    val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root").getOrElse(
      throw new IllegalStateException(s"spark.sql.catalog.$cat.root is not set"))
    val dir = s"$root/$table"
    val head = FileGroups.committedId(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed file-group table '$table' under $root"))

    def snapshotAt(v: Long) = FileGroups.readAt(spark, dir, v).getOrElse {
      val retained = Ingest.snapshotVersions(spark, dir)
      throw new IllegalArgumentException(
        s"version $v of $qualified is not retained (head: $head, retained: " +
          s"${retained.mkString(", ")}) — an aged-out incremental base means the " +
          "consumer must re-bootstrap from a full snapshot read")
    }
    require(fromV <= toV, s"$usage: from_version $fromV must be <= to_version $toV")

    // keys/ord from the self-describing manifest (the same resolution
    // rule as the catalog's loadTable); the diff needs ONE ordering
    // column to decide update-vs-unchanged
    val (schemaOpt, keysOpt, ordOpt) = FileGroups.tableMetaFor(spark, dir, toV)
    val keys = keysOpt.getOrElse(throw new IllegalStateException(
      s"manifest of $qualified records no key columns (pre-r17 table) — rebuild, " +
        "or diff through ChangeFeed.diff with explicit keys"))
    val ord = ordOpt match {
      case Some(Seq(one)) => one
      case other => throw new IllegalStateException(
        s"graft_table_changes needs exactly one manifest ordering column, " +
          s"found ${other.fold("none")(_.mkString(", "))}")
    }
    val schema = schemaOpt.getOrElse(snapshotAt(toV).schema)
    val lower = (keys :+ ord).map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val carry = schema.fields.map(_.name)
      .filterNot(n => lower.contains(n.toLowerCase(java.util.Locale.ROOT))).toSeq

    val diff = ChangeFeed.diff(snapshotAt(fromV), snapshotAt(toV), keys, ord, carry)
    // stable, SQL-friendly column order: keys, change_op, then the
    // before/after image pairs
    import org.apache.spark.sql.functions.col
    val ordered = diff.select(
      (keys.map(col) :+ col("change_op")) ++
        ((ord +: carry).flatMap(c => Seq(col(s"before_$c"), col(s"after_$c")))): _*)
    ordered.queryExecution.analyzed
  }
}
