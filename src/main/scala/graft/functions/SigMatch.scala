package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native MinHash signature agreement: the number of equal slots in
  * two bigint arrays — the per-candidate-pair kernel of sketch-only
  * Jaccard estimation (q66: est_jaccard = sigmatch / numPerms).
  *
  * Why a custom Catalyst Expression (SURVEY preference tier b): the
  * builtin formulation `size(filter(zip_with(a, b, (x,y) -> x = y),
  * m -> m))` is two interpreted higher-order lambdas that allocate a
  * zipped array and a filtered array PER PAIR. At test scale the pair
  * count is tiny, but the 100 TB similarity path runs this kernel once
  * per LSH candidate pair — O(corpus) times — where an interpreted
  * allocating lambda chain is exactly what the dedup hot path must
  * avoid (same rationale as [[DotProduct]]). This compiles to a tight
  * primitive loop inside whole-stage codegen, no allocation.
  *
  * Null semantics: null arrays propagate null; length mismatch yields
  * null (two signatures of different widths are not comparable — a
  * mismatch is a pipeline bug, surfaced as null rather than a wrong
  * count); a null ELEMENT yields null. Signature arrays produced by
  * graft_minhash contain no nulls, so these paths are defensive only.
  */
case class SigMatch(left: Expression, right: Expression) extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sigmatch requires (array<bigint>, array<bigint>), got (${l.simpleString}, ${r.simpleString})"
        )
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sigmatch"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("smN")
        val i = ctx.freshName("smI")
        val acc = ctx.freshName("smAcc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $acc = 0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    if ($a.getLong($i) == $b.getLong($i)) $acc++;
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigMatch =
    copy(left = newLeft, right = newRight)
}
