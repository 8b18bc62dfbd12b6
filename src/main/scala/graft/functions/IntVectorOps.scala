package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native integer-vector kernels over the quantized (array<bigint>)
  * embeddings the k-means family works in.
  *
  * Why (SURVEY preference tier b, the round-11 JIT lesson continued):
  * the unrolled 64-term `element_at` Column trees these replace are
  * correct but codegen-hostile — under ANSI semantics EVERY
  * element_at carries an invalid-index error branch plus a
  * DataFrameQueryContext reference, so a pair join evaluating three
  * 64-dim kernels accumulated ~900 object references and janino gave
  * up compiling the enclosing aggregate (ERROR CodeGenerator →
  * interpreted fallback on the SemDeDup prune's hottest path). A
  * tight primitive loop is one reference and a few dozen bytecodes.
  *
  * Integer sums are order-free and exact, so these are answer-
  * invisible replacements; null contract matches [[DotProduct]]
  * (null array / null element / length mismatch → null).
  */
private[functions] trait LongVectorKernel extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got (${l.simpleString}, ${r.simpleString})"
        )
    }

  override def dataType: DataType = LongType
}

/** Σ (a_i − shift)·(b_i − shift) — the CENTERED integer dot product
  * (shift = KMeans.Shift recenters the [0, 254] quantized coords;
  * shift = 0 is the plain integer dot).
  */
case class DotShifted(left: Expression, right: Expression, shift: Int) extends LongVectorKernel {

  override def prettyName: String = "graft_doti"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += (x.getLong(i) - shift) * (y.getLong(i) - shift)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("dotN")
        val i = ctx.freshName("dotI")
        val acc = ctx.freshName("dotAcc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += ($a.getLong($i) - $shift) * ($b.getLong($i) - $shift);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotShifted =
    copy(left = newLeft, right = newRight)
}

/** Σ (a_i − b_i)² — integer squared L2 distance (the k-means /
  * kNN-join metric).
  */
case class Dist2Long(left: Expression, right: Expression) extends LongVectorKernel {

  override def prettyName: String = "graft_dist2i"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("d2N")
        val i = ctx.freshName("d2I")
        val acc = ctx.freshName("d2Acc")
        val d = ctx.freshName("d2D")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    final long $d = $a.getLong($i) - $b.getLong($i);
           |    $acc += $d * $d;
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Dist2Long =
    copy(left = newLeft, right = newRight)
}
