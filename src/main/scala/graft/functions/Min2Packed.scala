package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference,
  CreateArray,
  Expression,
  Greatest,
  If,
  IsNull,
  Least,
  Literal
}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Two smallest values of a BIGINT column, as `array<bigint>`
  * [m1, m2] with Long.MaxValue sentinels for absent slots —
  * `graft_min2p(packedKey)`, the DECLARATIVE counterpart of
  * [[MinTop2Agg]] for callers that can pack their (key, id) pair into
  * one non-negative long (KMeans.assignMultiProbe packs
  * d2 · 2^idBits + cid, order-preserving because cid < 2^idBits).
  *
  * Why a second formulation exists (round 16): [[MinTop2Agg]] is a
  * TypedImperativeAggregate, which plans as ObjectHashAggregateExec —
  * and that operator falls back to SORT-BASED aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) distinct grouping keys per task. Every per-vector
  * aggregate over a centroid fan-out has millions of keys per task,
  * so the fallback externally sorted the whole N·√k candidate
  * fan-out — measured at the 1024× decade as 722 GB of spill in the
  * multi-probe assign phase (r15 verdict #3). This aggregate's buffer
  * is two mutable LongType slots, so it plans into
  * HashAggregateExec inside whole-stage codegen: map-side partials
  * collapse the fan-out to ≤1 row per vector per partition and
  * nothing fan-out-sized is ever sorted.
  *
  * Duplicate inputs count as separate values (m1 = m2 = x when x
  * appears twice) — unlike MinTop2Agg's distinct-id rule. The KMeans
  * packs satisfy distinctness by construction (a centroid id appears
  * at most once per vector, and the id lives in the packed key's low
  * bits), so the two formulations agree everywhere the engine uses
  * them; FunctionsSpec pins the parity.
  *
  * Nulls are ignored (treated as the MaxValue sentinel). Inputs must
  * be < Long.MaxValue for the sentinel to be unambiguous — packed
  * keys are ≤ 2^62 by the packer's static headroom check.
  */
case class Min2PackedAgg(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_min2p"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_min2p requires bigint, got ${t.simpleString}")
    }

  private lazy val m1 = AttributeReference("m1", LongType, nullable = false)()
  private lazy val m2 = AttributeReference("m2", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m1, m2)

  private val sentinel = Literal(Long.MaxValue, LongType)

  override lazy val initialValues: Seq[Expression] = Seq(sentinel, sentinel)

  // two smallest of {m1, m2, x}: min(m1, x) and min(m2, max(m1, x)).
  // Catalyst mutable projections evaluate every update expression
  // against the OLD buffer before writing any result back, so both
  // expressions read the pre-update m1.
  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), sentinel, child)
    Seq(Least(Seq(m1, x)), Least(Seq(m2, Greatest(Seq(m1, x)))))
  }

  // two smallest of {m1L, m2L, m1R, m2R}, using m1 ≤ m2 on each side:
  // min(m1L, m1R) and min(max(m1L, m1R), min(m2L, m2R)).
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Least(Seq(m1.left, m1.right)),
    Least(Seq(Greatest(Seq(m1.left, m1.right)), Least(Seq(m2.left, m2.right))))
  )

  override lazy val evaluateExpression: Expression = CreateArray(Seq(m1, m2))

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Min2PackedAgg =
    copy(child = newChildren.head)
}
