package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Add,
  AttributeReference,
  BitwiseAnd,
  CreateArray,
  Expression,
  If,
  IsNull,
  Least,
  Literal,
  Multiply,
  Remainder,
  ShiftRightUnsigned
}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Declarative MinHash signature aggregate — `graft_minhash(h,
  * numPerms)` over [[PortableHash]] 62-bit shingle hashes →
  * `array<bigint>` of per-permutation minima, perm_p =
  * [[PortableHash.perm]] (two independent 31-bit mulmods over the
  * hash's halves, all arithmetic in signed-64 range — the same
  * expressions the DuckDB oracle evaluates, so signatures stay
  * bit-reproducible).
  *
  * Why DECLARATIVE (round 17, the [[MinKPackedAgg]] lesson applied to
  * the engine's last hot typed aggregate): the previous
  * TypedImperativeAggregate planned as ObjectHashAggregateExec, whose
  * per-task object map is UNTRACKED heap with a sort-based fallback
  * past the configured distinct-key threshold — at the 256× decade
  * (1.33M docs / 32 repartitioned tasks = 41.6k keys against the 32k
  * bound) the fallback externally sorted the whole shingle frame
  * through the 520 B/doc buffers: 8.1 GB of spill in the signature
  * phase alone, and at 2048× the same map arithmetic (332k keys ×
  * 520 B = 172 MB/task × 32, untracked) is the next heap OOM class.
  * This buffer is numPerms mutable LongType slots, so it plans into
  * HashAggregateExec: fixed-width tracked memory, graceful spill,
  * whole-stage codegen, and map-side partials that collapse the
  * doc-contiguous explode output to ~one row per document — no
  * repartition cliff at any corpus size.
  *
  * Each slot's update is `least(m_p, perm_p(h))`; hi/lo subtrees are
  * the SAME expression instances across slots so codegen's
  * subexpression elimination computes them once per row. Merge is
  * slot-wise least; duplicates cannot change a minimum, so the
  * aggregate is multiplicity-blind (the [[graft.dedup.Dedup.shingleRows]]
  * streaming contract).
  */
case class MinHashDeclAgg(child: Expression, permsExpr: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child, permsExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  private lazy val numPerms: Int = permsExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"graft_minhash requires bigint input, got ${child.dataType.simpleString}")
    else if (
      !permsExpr.foldable ||
      !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(permsExpr.dataType)
    )
      TypeCheckResult.TypeCheckFailure("graft_minhash numPerms must be a foldable integer")
    else if (permsExpr.eval() == null || numPerms < 1 || numPerms > MinHashDeclAgg.MaxPerms)
      TypeCheckResult.TypeCheckFailure(s"graft_minhash numPerms must be in [1, ${MinHashDeclAgg.MaxPerms}]")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val slots: Seq[AttributeReference] =
    (0 until numPerms).map(p => AttributeReference(s"mh$p", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots

  private val sentinel = Literal(Long.MaxValue, LongType)

  override lazy val initialValues: Seq[Expression] = Seq.fill(numPerms)(sentinel)

  override lazy val updateExpressions: Seq[Expression] = {
    val P = Literal(PortableHash.P, LongType)
    // Mask62: identity for PortableHash outputs, keeps the mulmods
    // overflow-free for arbitrary bigint inputs (see PortableHash).
    // ONE hi and ONE lo instance shared by every slot (codegen CSE).
    val hm = BitwiseAnd(child, Literal(PortableHash.Mask62, LongType))
    val hi = ShiftRightUnsigned(hm, Literal(31))
    val lo = BitwiseAnd(hm, Literal(PortableHash.Mask31, LongType))
    val isNull = IsNull(child)
    slots.zipWithIndex.map { case (m, p) =>
      // ((A_p·hi) mod P + (B_p·lo) mod P + C_p) mod P — every
      // intermediate < 2^62 + 3·2^31, signed-64-safe (PortableHash.perm)
      val x = Remainder(
        Add(
          Add(
            Remainder(Multiply(Literal(PortableHash.permA(p), LongType), hi), P),
            Remainder(Multiply(Literal(PortableHash.permB(p), LongType), lo), P)
          ),
          Literal(PortableHash.permC(p), LongType)
        ),
        P
      )
      If(isNull, m, Least(Seq(m, x)))
    }
  }

  override lazy val mergeExpressions: Seq[Expression] =
    slots.map(m => Least(Seq(m.left, m.right)))

  override lazy val evaluateExpression: Expression = CreateArray(slots)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashDeclAgg =
    copy(child = newChildren.head, permsExpr = newChildren(1))
}

object MinHashDeclAgg {

  /** 64 is the q32-family operating point; the buffer is numPerms
    * mutable longs (520 B at 64), comfortably fixed-width.
    */
  val MaxPerms = 128
}
