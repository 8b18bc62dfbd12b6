package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two double arrays.
  *
  * Why a custom Catalyst Expression (SURVEY preference tier b): the
  * built-in formulations are either interpreted higher-order functions
  * (`aggregate`/`zip_with` — allocates a zipped array per row, ~125 µs
  * per 64-dim pair in round 1) or an unrolled `element_at` tree that
  * needs the dimension count at plan time and grows the generated
  * code linearly. This expression works for any vector length and
  * compiles to a tight primitive loop inside whole-stage codegen.
  *
  * The accumulation is a sequential left-to-right loop — the SAME
  * addition order as the unrolled tree, `dotFold`, and DuckDB's
  * `list_reduce` — so results are bit-identical across all four
  * formulations (IEEE addition is order-sensitive; the order is part
  * of the contract here).
  *
  * Null handling matches the interpreted
  * `aggregate(zip_with(a, b, *), 0.0, +)` fold EXACTLY — this is what
  * lets RewriteDotProduct substitute one for the other globally:
  * null arrays propagate null; arrays of different lengths yield null
  * (zip_with null-pads the shorter side, and the multiply/add fold
  * turns any null into a null result); a null ELEMENT likewise yields
  * null.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  // can return null for non-null inputs (length mismatch, null element)
  override def nullable: Boolean = true

  // manual check (ExpectsInputTypes' AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires (array<double>, array<double>), got (${l.simpleString}, ${r.simpleString})"
        )
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
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
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
