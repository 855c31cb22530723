package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd PQ assignment kernel: quantize an `array<bigint>` SQ8 code
  * to its per-subspace nearest codewords in ONE expression.
  *
  * The composed form ([[graft.ops.Vectors.pqAssign]]: `least` over
  * ncw encoded L2 folds per subspace) inlines m·ncw loop bodies into
  * the generated projection — at 16×32 the method blows the JVM limit,
  * Janino fails, and the WHOLE corpus-encode projection silently runs
  * interpreted (measured 1.3 s/pass on the sf0.1 corpus vs 0.1 s
  * here). This expression keeps the codebook as a reference object
  * (`long[m][ncw][d]`) and generates the tight triple loop instead —
  * constant code size in m and ncw.
  *
  * Semantics match the composed form exactly: per subspace, argmin of
  * the integer squared-L2 distance, ties to the LOWEST codeword id
  * (strict `<` keeps the first minimum). `emitCodes=true` returns the
  * m codeword ids (what a PQ index STORES — m bytes at ncw ≤ 256);
  * `emitCodes=false` returns the m·d reconstructed concat (what ADC
  * scores against). Null in → null out; a length mismatch with the
  * codebook's m·d is null (a data bug worth surfacing, the FloatDot
  * rule); a null ELEMENT nulls the row (matches the composed fold).
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Long]]],
                    emitCodes: Boolean)
    extends UnaryExpression {

  private val m = codebook.length
  private val ncw = codebook.head.length
  private val d = codebook.head.head.length
  require(codebook.forall(sub => sub.length == ncw && sub.forall(_.length == d)),
    "ragged codebook")

  @transient private lazy val cbArr: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def containsNulls: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<bigint>, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m * d) return null
    if (containsNulls) {
      var i = 0
      while (i < m * d) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Long](if (emitCodes) m else m * d)
    var mm = 0
    while (mm < m) {
      var best = Long.MaxValue
      var bj = 0
      var j = 0
      while (j < ncw) {
        val cw = cbArr(mm)(j)
        var s = 0L
        var i = 0
        while (i < d) {
          val diff = x.getLong(mm * d + i) - cw(i)
          s += diff * diff
          i += 1
        }
        if (s < best) { best = s; bj = j }
        j += 1
      }
      if (emitCodes) out(mm) = bj.toLong
      else System.arraycopy(cbArr(mm)(bj), 0, out, mm * d, d)
      mm += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "long[][][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val mm = ctx.freshName("mm")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val cw = ctx.freshName("cw")
      val bad = ctx.freshName("bad")
      val outLen = if (emitCodes) m else m * d
      val nullScan = if (containsNulls)
        s"""boolean $bad = false;
           |for (int $i = 0; $i < ${m * d}; $i++) {
           |  if ($a.isNullAt($i)) { $bad = true; break; }
           |}
           |if ($bad) { ${ev.isNull} = true; } else
         """.stripMargin
      else ""
      val emit = if (emitCodes) s"$out[$mm] = (long) $bj;"
      else s"System.arraycopy($cbRef[$mm][$bj], 0, $out, $mm * $d, $d);"
      s"""
         |if ($a.numElements() != ${m * d}) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan {
         |    long[] $out = new long[$outLen];
         |    for (int $mm = 0; $mm < $m; $mm++) {
         |      long $best = Long.MAX_VALUE;
         |      int $bj = 0;
         |      for (int $j = 0; $j < $ncw; $j++) {
         |        long[] $cw = $cbRef[$mm][$j];
         |        long $s = 0L;
         |        for (int $i = 0; $i < $d; $i++) {
         |          long $diff = $a.getLong($mm * $d + $i) - $cw[$i];
         |          $s += $diff * $diff;
         |        }
         |        if ($s < $best) { $best = $s; $bj = $j; }
         |      }
         |      $emit
         |    }
         |    ${ev.value} = new $gad($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

object PqEncode {
  /** The m stored codeword ids per row. */
  def codes(code: Column, codebook: Seq[Seq[Seq[Long]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(code), codebook, emitCodes = true))

  /** The m·d reconstructed (decoded) code concat per row. */
  def recon(code: Column, codebook: Seq[Seq[Seq[Long]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(code), codebook, emitCodes = false))
}
