package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer dot product of two `array<bigint>` code columns —
  * the [[FloatDot]] twin for the quantized ANN family (SQ8 codes, PQ
  * reconstructions), where every score is an exact integer sum.
  *
  * The composed form (`aggregate(zip_with(a, b, *), 0L, +)`) is
  * CodegenFallback — interpreted, allocating a zipped array per row —
  * and it sits on the hot path of every quantized similarity query
  * (corpus-side per-candidate scoring). Same null semantics as
  * FloatDot: null if either array is null, lengths differ, or any
  * element is null; the per-element null check is emitted only when
  * containsNull is true. Integer addition is associative and
  * overflow-free here (|code| ≤ 127, dims ≤ thousands ⇒ |sum| « 2^63),
  * so results are bit-identical to the composed form and to any
  * engine's evaluation order — the full-value oracles are unaffected.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def containsNulls: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ldot requires two array<bigint> arguments, got " +
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
    var sum = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      sum += x.getLong(i) * y.getLong(i)
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
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_ldot"
}

object LongDot {
  /** Column-API entry — works in ANY session (no registry needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(LongDot(Bridge.expression(a), Bridge.expression(b)))
}

/** Codegen'd integer squared-L2 distance Σ(a_i−b_i)² of two
  * `array<bigint>` code columns — the PQ assignment kernel: one of
  * these runs per (row × subspace × codeword), so the interpreted
  * composed form (`aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0L, +)`) dominated q_sim_pq's corpus encode. Null semantics and
  * exactness rules identical to [[LongDot]]. */
case class LongL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def containsNulls: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ll2 requires two array<bigint> arguments, got " +
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
    var sum = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = x.getLong(i) - y.getLong(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      val nullCheck = if (containsNulls)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $sum += $d * $d;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_ll2"
}

object LongL2 {
  /** Column-API entry — works in ANY session (no registry needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(LongL2(Bridge.expression(a), Bridge.expression(b)))
}
