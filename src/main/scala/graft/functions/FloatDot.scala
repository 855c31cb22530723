package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two `array<float>` embedding columns.
  *
  * The composed form (`aggregate(zip_with(a, b, *), 0.0, +)`) is
  * CodegenFallback — interpreted, allocating a zipped array per row —
  * and profiling showed it dominates the similarity queries. This is the
  * one place the engine drops to a custom Catalyst `Expression`
  * (SURVEY.md §7.4's profiling gate): a tight primitive loop over the
  * two `ArrayData`, inside whole-stage codegen, no allocation.
  *
  * Semantics match the composed form exactly: left-to-right summation
  * of float→double products (bitwise-identical results, so the DuckDB
  * oracles are unaffected); null if either array is null, the lengths
  * differ (zip_with pads the short side with null, which nulls the
  * composed sum — mismatched embeddings are a data bug worth surfacing,
  * not truncating), OR any element is null (null * x is null and
  * acc + null nulls the composed fold). The per-element null check is
  * emitted only when the array type's containsNull is true — on the
  * common containsNull=false embedding columns the loop stays tight.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def containsNulls: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = containsNulls
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val nullCheck = if (containsNulls)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object FloatDot {
  /** Column-API entry — works in ANY session (no registry needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))
}

/** SQL-surface registration via SparkSessionExtensions:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` then
  * `SELECT graft_dot(a.embedding, b.embedding) ...`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotEntry)
    ext.injectFunction(GraftExtensions.ldotEntry)
    // MERGE INTO on graft_cdc tables: rewrite the resolved MergeIntoTable
    // onto the crash-safe FileGroups.commit path (post-hoc — after the
    // main resolution batch, before Spark's unsupported-operation check)
    ext.injectPostHocResolutionRule(session => new graft.sources.FileGroupMergeRule(session))
    // FROM graft_table_changes('cat.t', v1, v2): the incremental change
    // feed as a TABLE-VALUED function (a distributed diff plan, not
    // driver-side procedure rows)
    ext.injectTableFunction(GraftExtensions.tableChangesEntry)
    // spark.read.option("startingVersion", v).table("graft_cdc.t"):
    // Hudi's incremental-query read option — rows upserted since a
    // retained version, lowered to a pushable ord-threshold filter
    ext.injectPostHocResolutionRule(session => new graft.sources.IncrementalReadRule(session))
  }
}

object GraftExtensions {
  private val dotEntry = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
    (children: Seq[Expression]) => FloatDot(children(0), children(1)): Expression)

  private val ldotEntry = (
    new FunctionIdentifier("graft_ldot"),
    new ExpressionInfo(classOf[LongDot].getName, "graft_ldot"),
    (children: Seq[Expression]) => LongDot(children(0), children(1)): Expression)

  private val tableChangesEntry = (
    graft.sources.TableChangesFunction.ident,
    graft.sources.TableChangesFunction.info,
    (args: Seq[Expression]) => graft.sources.TableChangesFunction.builder(args))

  /** Register into an already-running session (tests, REPL, the
    * driver's session) — `withExtensions` only applies at build time. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, dotEntry._1, dotEntry._2, dotEntry._3)
    Bridge.registerFunction(spark, ldotEntry._1, ldotEntry._2, ldotEntry._3)
    Bridge.registerTableFunction(spark,
      tableChangesEntry._1, tableChangesEntry._2, tableChangesEntry._3)
  }
}
