package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Add,
  AttributeReference,
  BitwiseAnd,
  Expression,
  GreaterThan,
  If,
  IsNull,
  Literal,
  Multiply,
  ShiftRightUnsigned,
  Subtract
}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Declarative SimHash aggregate — `graft_simhash(h)` over
  * [[PortableHash]] hashes → the 60-bit majority-vote signature as one
  * bigint. Bit j of the result is 1 iff strictly more input hashes
  * have bit j set than clear (ties → 0), over the hash's low 60 bits
  * (the pigeonhole chunk join downstream uses 4 × 15-bit chunks). The
  * DuckDB oracle mirrors it with 60 SQL sum aggregates.
  *
  * Why DECLARATIVE (round 17, the [[MinHashDeclAgg]] treatment for
  * the engine's other per-doc typed aggregate): the typed version
  * planned as ObjectHashAggregate — untracked object maps, doc_id
  * repartition guard, and the 32k-key sort-based fallback re-sorting
  * the shingle frame at decade doc counts. Sixty mutable LongType
  * vote counters plan into whole-stage-codegen HashAggregate:
  * tracked, spillable, partial aggregation at any cardinality, no
  * repartition. Each slot's update is m_j += 2·bit_j(h) − 1; merge is
  * slot-wise add; evaluate re-assembles the majority bits into one
  * long (disjoint bit positions, so a plain sum equals the OR).
  */
case class SimHashDeclAgg(child: Expression) extends DeclarativeAggregate {

  import SimHashDeclAgg.Bits

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_simhash requires bigint input, got ${t.simpleString}")
    }

  private lazy val slots: Seq[AttributeReference] =
    (0 until Bits).map(j => AttributeReference(s"sh$j", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots

  override lazy val initialValues: Seq[Expression] = Seq.fill(Bits)(Literal(0L, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val isNull = IsNull(child)
    slots.zipWithIndex.map { case (m, j) =>
      val bit = BitwiseAnd(ShiftRightUnsigned(child, Literal(j)), Literal(1L, LongType))
      If(isNull, m, Add(m, Subtract(Multiply(bit, Literal(2L, LongType)), Literal(1L, LongType))))
    }
  }

  override lazy val mergeExpressions: Seq[Expression] =
    slots.map(m => Add(m.left, m.right))

  override lazy val evaluateExpression: Expression =
    slots.zipWithIndex
      .map { case (m, j) =>
        If(GreaterThan(m, Literal(0L, LongType)), Literal(1L << j, LongType), Literal(0L, LongType))
      }
      .reduce[Expression]((a, b) => Add(a, b))

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashDeclAgg =
    copy(child = newChildren.head)
}

object SimHashDeclAgg {

  /** Signature width: the hash's portable low bits (62-bit hash → 60
    * used, divisible by the 4-chunk pigeonhole banding).
    */
  val Bits: Int = 60
}
