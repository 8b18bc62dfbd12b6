package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Bloom filter build: `graft_bloom(h, numBits, numHashes)`
  * over bigint keys → the bitset as `array<bigint>` (numBits/64
  * words). Bit d for key h is [[PortableHash.perm]]₍d₎(h) mod numBits.
  *
  * The runtime-filter pattern: build the filter over the SMALL side's
  * join keys (one aggregate → a KB-scale bitset), broadcast it, and
  * prune the fact scan with [[BloomContains]] BEFORE the join's
  * shuffle — false positives only cost the exact join a little extra
  * verify work, never a wrong answer, so the query's RESULT is
  * byte-identical to the plain join (q102's oracle is exactly that
  * plain semi-join). Merges are pure bitwise ORs: commutative,
  * associative, bit-deterministic under any partitioning.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0, s"graft_bloom numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"graft_bloom numHashes must be in [1,16], got $numHashes")

  private val as: Array[Long] = Array.tabulate(numHashes)(PortableHash.permA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(PortableHash.permB)
  private val cs: Array[Long] = Array.tabulate(numHashes)(PortableHash.permC)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_bloom"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_bloom requires bigint input, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & PortableHash.Mask62
      val hi = h >>> 31
      val lo = h & PortableHash.Mask31
      var d = 0
      while (d < numHashes) {
        val x = PortableHash.permParts(as(d), bs(d), cs(d), hi, lo)
        val j = x % numBits
        buffer((j >>> 6).toInt) |= (1L << (j & 63L))
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) |= other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numBits / 64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Native Bloom membership probe: `graft_bloom_contains(bloom, h,
  * numHashes)` — true iff every one of the key's numHashes bits is
  * set. Runs once per FACT row in the pruning filter, so it compiles
  * into whole-stage codegen as a tight primitive loop (same rationale
  * as [[SigMatch]]); never a false negative by construction.
  */
case class BloomContains(left: Expression, right: Expression, numHashes: Int) extends BinaryExpression {

  require(numHashes >= 1 && numHashes <= 16, s"graft_bloom_contains numHashes must be in [1,16], got $numHashes")

  private val as: Array[Long] = Array.tabulate(numHashes)(PortableHash.permA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(PortableHash.permB)
  private val cs: Array[Long] = Array.tabulate(numHashes)(PortableHash.permC)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains requires (array<bigint>, bigint), got (${l.simpleString}, ${r.simpleString})"
        )
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloomAny: Any, hAny: Any): Any = {
    val arr = bloomAny.asInstanceOf[ArrayData]
    val bits = arr.numElements().toLong * 64L
    val h = hAny.asInstanceOf[Long] & PortableHash.Mask62
    val hi = h >>> 31
    val lo = h & PortableHash.Mask31
    var d = 0
    while (d < numHashes) {
      val x = PortableHash.permParts(as(d), bs(d), cs(d), hi, lo)
      val j = x % bits
      if ((arr.getLong((j >>> 6).toInt) & (1L << (j & 63L))) == 0L) return false
      d += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asR = ctx.addReferenceObj("bloomAs", as, "long[]")
    val bsR = ctx.addReferenceObj("bloomBs", bs, "long[]")
    val csR = ctx.addReferenceObj("bloomCs", cs, "long[]")
    val p = PortableHash.P
    nullSafeCodeGen(
      ctx,
      ev,
      (arr, h) => {
        val bits = ctx.freshName("bcBits")
        val hm = ctx.freshName("bcHm")
        val hi = ctx.freshName("bcHi")
        val lo = ctx.freshName("bcLo")
        val d = ctx.freshName("bcD")
        val x = ctx.freshName("bcX")
        val j = ctx.freshName("bcJ")
        val all = ctx.freshName("bcAll")
        s"""
           |final long $bits = (long) $arr.numElements() * 64L;
           |final long $hm = $h & ${PortableHash.Mask62}L;
           |final long $hi = $hm >>> 31;
           |final long $lo = $hm & ${PortableHash.Mask31}L;
           |boolean $all = true;
           |for (int $d = 0; $d < $numHashes; $d++) {
           |  final long $x = (($asR[$d] * $hi) % ${p}L + ($bsR[$d] * $lo) % ${p}L + $csR[$d]) % ${p}L;
           |  final long $j = $x % $bits;
           |  if (($arr.getLong((int) ($j >>> 6)) & (1L << ($j & 63L))) == 0L) { $all = false; break; }
           |}
           |${ev.value} = $all;
         """.stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
