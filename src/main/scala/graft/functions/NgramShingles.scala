package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling over a tokens array: element i is
  * `tokens[i] ⧺ " " ⧺ … ⧺ tokens[i+n-1]`; empty array when the doc has
  * fewer than n tokens.
  *
  * The composed form (Text.shinglesComposed: transform(sequence(...),
  * concat_ws over element_at)) is CodegenFallback — interpreted, with a
  * lambda dispatch per element — and shingling feeds every dedup /
  * fingerprint / decontamination operator, so it is the engine's second
  * profiling-justified custom expression (after FloatDot). Produces the
  * identical strings, so every DuckDB oracle is unaffected — including
  * on null tokens, which are SKIPPED exactly as the composed concat_ws
  * skips null arguments (UnsafeArrayData.getUTF8String on a null slot
  * would otherwise yield "" and insert a phantom separator). The
  * per-element null check is emitted only when the input array type's
  * containsNull is true.
  */
case class NgramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  private def containsNulls: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles requires array<string>, got ${other.catalogString}")
  }

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val cnt = math.max(m - n + 1, 0)
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val checkNulls = containsNulls
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          // null parts are skipped by concatWs, matching composed concat_ws
          parts(j) = if (checkNulls && toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = classOf[UTF8String].getName
      s"""
         |int $m = $a.numElements();
         |int $cnt = $m - ${n - 1} > 0 ? $m - ${n - 1} : 0;
         |$u[] $out = new $u[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  $u[] $parts = new $u[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = ${if (containsNulls) s"$a.isNullAt($i + $j) ? null : " else ""}$a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u.concatWs($spaceRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_shingles"
}

object NgramShingles {
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(NgramShingles(Bridge.expression(tokens), n))
}
