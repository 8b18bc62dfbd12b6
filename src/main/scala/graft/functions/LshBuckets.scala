package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All LSH table buckets of a vector in ONE native loop:
  * `graft_lshbuckets(v, planeMatrix, planesPerTable)` → array<long>
  * with element t = the sign-pattern bucket of table t (bit j set iff
  * dot(v, planeMatrix[t·planesPerTable + j]) > 0).
  *
  * Why a custom Expression (SURVEY preference tier b): the Column
  * formulation — numTables·planesPerTable independent `graft_dot(v,
  * lit(plane))` calls folded into per-table buckets — generates ONE
  * huge Java method. With the round-11 CORPUS-SCALED plane counts
  * (q34: 16·p planes, q36: 8·p, p growing ~log N) that method passes
  * janino but blows past HotSpot's ~8 KB JIT threshold, so the
  * hottest projection in both queries ran as INTERPRETED BYTECODE:
  * measured 50.8 s for 8 tables × 12 planes over 100k vectors where
  * 8 × 4 took 2.0 s — a 25× cliff for 3× the arithmetic. Here the
  * whole hash is a nested primitive loop over a constant matrix
  * literal: small method, JIT-compiled, and the generator input is a
  * single expression (no subexpression-elimination gamble across the
  * explode boundary).
  *
  * Each row's dot accumulates sequentially left-to-right — the same
  * order as [[DotProduct]], so the sign decisions are bit-identical
  * to the per-plane `graft_dot` formulation and to the oracle's
  * `list_reduce` dots.
  *
  * Null contract: a null vector, a null element, or a plane-row/vector
  * length mismatch yields a NULL result (the whole array) — the
  * caller's explode then drops the degenerate vector from the index
  * instead of colliding every such vector into bucket 0 of every
  * table (which is what the old `when(dot > 0, …)` fold silently did
  * with null dots).
  */
case class LshBuckets(left: Expression, right: Expression, planesPerTable: Int)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        if (planesPerTable < 1 || planesPerTable > 63)
          TypeCheckResult.TypeCheckFailure(
            s"graft_lshbuckets planesPerTable must be in [1, 63], got $planesPerTable"
          )
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_lshbuckets requires (array<double>, array<array<double>>), " +
            s"got (${l.simpleString}, ${r.simpleString})"
        )
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lshbuckets"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val rows = m.numElements()
    val n = v.numElements()
    val out = new Array[Long]((rows + planesPerTable - 1) / planesPerTable)
    var r = 0
    while (r < rows) {
      if (m.isNullAt(r)) return null
      val row = m.getArray(r)
      if (row.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i) || row.isNullAt(i)) return null
        acc += v.getDouble(i) * row.getDouble(i)
        i += 1
      }
      if (acc > 0) out(r / planesPerTable) |= 1L << (r % planesPerTable)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (v, m) => {
        val rows = ctx.freshName("lshRows")
        val n = ctx.freshName("lshN")
        val out = ctx.freshName("lshOut")
        val r = ctx.freshName("lshR")
        val i = ctx.freshName("lshI")
        val acc = ctx.freshName("lshAcc")
        val row = ctx.freshName("lshRow")
        val ad = classOf[ArrayData].getName
        val gad = classOf[GenericArrayData].getName
        s"""
           |final int $rows = $m.numElements();
           |final int $n = $v.numElements();
           |final long[] $out = new long[($rows + $planesPerTable - 1) / $planesPerTable];
           |for (int $r = 0; $r < $rows && !${ev.isNull}; $r++) {
           |  if ($m.isNullAt($r)) { ${ev.isNull} = true; break; }
           |  final $ad $row = $m.getArray($r);
           |  if ($row.numElements() != $n) { ${ev.isNull} = true; break; }
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($v.isNullAt($i) || $row.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += $v.getDouble($i) * $row.getDouble($i);
           |  }
           |  if (!${ev.isNull} && $acc > 0) $out[$r / $planesPerTable] |= 1L << ($r % $planesPerTable);
           |}
           |if (!${ev.isNull}) ${ev.value} = new $gad($out);
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}
