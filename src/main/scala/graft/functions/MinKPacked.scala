package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference,
  CreateArray,
  Expression,
  GetArrayItem,
  Greatest,
  If,
  IsNull,
  Least,
  Literal,
  SortArray
}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** K smallest values of a BIGINT column, as `array<bigint>`
  * [m1 ≤ … ≤ mK] with Long.MaxValue sentinels for absent slots —
  * `graft_minkp(packedKey, k)`, the declarative top-K counterpart of
  * the typed [[MinTop2Agg]] for callers that can pack their
  * (key, id) pair into one non-negative long (KMeans packs
  * d2 · 2^idBits + cid, order-preserving because cid < 2^idBits).
  *
  * Why it exists (round 16): MinTop2Agg is a
  * TypedImperativeAggregate, which plans as ObjectHashAggregateExec —
  * and that operator falls back to SORT-BASED aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) distinct grouping keys per task. Every per-vector
  * aggregate over a centroid fan-out has millions of keys per task,
  * so the fallback externally sorted the whole N·√k candidate
  * fan-out — measured at the 1024× decade as 722 GB of spill in the
  * multi-probe assign phase alone (r15 verdict #3). This aggregate's
  * buffer is K mutable LongType slots, so it plans into
  * HashAggregateExec inside whole-stage codegen: map-side partials
  * collapse the fan-out to ≤1 row per group per task and nothing
  * fan-out-sized is ever sorted.
  *
  * Duplicate inputs count as separate values (m1 = m2 = x when x
  * appears twice) — unlike MinTop2Agg's distinct-id rule. The KMeans
  * packs satisfy distinctness by construction (a centroid id appears
  * at most once per vector, and the id lives in the packed key's low
  * bits), so the two formulations agree everywhere the engine uses
  * them; FunctionsSpec pins the parity. Inputs must be
  * < Long.MaxValue for the sentinel to be unambiguous — packed keys
  * are ≤ 2^62 by the packer's static headroom check.
  *
  * The per-row update is the branch-free sorted insertion
  * nm₁ = min(m₁, x); nmᵢ = min(mᵢ, max(mᵢ₋₁, x)) — each slot reads
  * only PRE-update buffer values (Catalyst mutable projections
  * evaluate every update expression before writing any result).
  * Merge sorts the 2K candidate slots once per partial pair — K is a
  * probe count (≤ ~8), so the sort is constant-size.
  *
  * K must be a foldable positive integer ≤ [[MinKPackedAgg.MaxK]].
  */
case class MinKPackedAgg(child: Expression, kExpr: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minkp"

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"graft_minkp requires bigint, got ${child.dataType.simpleString}")
    else if (!kExpr.foldable || !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_minkp k must be a foldable integer")
    else if (kExpr.eval() == null || k < 1 || k > MinKPackedAgg.MaxK)
      TypeCheckResult.TypeCheckFailure(s"graft_minkp k must be in [1, ${MinKPackedAgg.MaxK}]")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val slots: Seq[AttributeReference] =
    (1 to k).map(i => AttributeReference(s"m$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots

  private val sentinel = Literal(Long.MaxValue, LongType)

  override lazy val initialValues: Seq[Expression] = Seq.fill(k)(sentinel)

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), sentinel, child)
    slots.zipWithIndex.map {
      case (m, 0) => Least(Seq(m, x))
      case (m, i) => Least(Seq(m, Greatest(Seq(slots(i - 1), x))))
    }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val merged = SortArray(CreateArray(slots.map(_.left) ++ slots.map(_.right)), Literal(true))
    (0 until k).map(i => GetArrayItem(merged, Literal(i)))
  }

  override lazy val evaluateExpression: Expression = CreateArray(slots)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinKPackedAgg =
    copy(child = newChildren.head, kExpr = newChildren(1))
}

object MinKPackedAgg {

  /** Probe counts are small by design; the buffer is K mutable longs
    * and the merge sorts 2K values per partial pair.
    */
  val MaxK = 8
}
