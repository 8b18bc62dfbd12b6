package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native MinHash signature aggregate: `graft_minhash(h, numPerms)`
  * over [[PortableHash]] 62-bit shingle hashes → `array<bigint>` of
  * per-permutation minima, perm_p = [[PortableHash.perm]] (two
  * independent 31-bit mulmods over the hash's halves).
  *
  * Why a custom aggregate (SURVEY preference tier b): the builtin
  * formulation is numPerms separate `min(...)` aggregate columns — a
  * 64-wide aggregate whose generated code dominated q32's cold time
  * (bench 7.0 s vs 2.2 s warm: most of the gap was compiling the
  * plan, not running it). One typed aggregate updates all minima in a
  * tight primitive loop, keeps map-side partial aggregation (buffers
  * merge), and shrinks the plan to one aggregate expression. The
  * permutation arithmetic stays in BIGINT range (A_p, h mod P < 2^31
  * so the product < 2^62), which is what lets the DuckDB oracle
  * reproduce every signature exactly (DedupSimQueries.q32).
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  private val as: Array[Long] = Array.tabulate(numPerms)(PortableHash.permA)
  private val bs: Array[Long] = Array.tabulate(numPerms)(PortableHash.permB)
  private val cs: Array[Long] = Array.tabulate(numPerms)(PortableHash.permC)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_minhash requires bigint input, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = Array.fill(numPerms)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // Mask62: identity for PortableHash outputs, keeps the mulmod
      // overflow-free for arbitrary bigint inputs (see PortableHash)
      val h = v.asInstanceOf[Long] & PortableHash.Mask62
      val hi = h >>> 31
      val lo = h & PortableHash.Mask31
      var p = 0
      while (p < numPerms) {
        val x = PortableHash.permParts(as(p), bs(p), cs(p), hi, lo)
        if (x < buffer(p)) buffer(p) = x
        p += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerms) {
      if (other(p) < buffer(p)) buffer(p) = other(p)
      p += 1
    }
    buffer
  }

  // clone: never alias the live mutable buffer into a Catalyst value —
  // safe under today's output-projection copy, fragile against
  // execution-path changes (e.g. sort-based fallback buffer reuse).
  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

/** Native SimHash aggregate: `graft_simhash(h)` over [[PortableHash]]
  * hashes → the 60-bit majority-vote signature as one bigint. Bit j of
  * the result is 1 iff strictly more input hashes have bit j set than
  * clear (ties → 0), over the hash's low 60 bits — 60 portable bits
  * (the pigeonhole chunk join downstream uses 4 × 15-bit chunks).
  *
  * Replaces a 64-column sum aggregate + 64-term horizontal bit
  * assembly for the same cold-plan-size reason as [[MinHashAgg]]
  * (q33 was the slowest bench query almost entirely from plan
  * compilation). The DuckDB oracle mirrors it with 60 SQL sum
  * aggregates — verbose there, but only the Spark side needs to be
  * fast.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  import SimHashAgg.Bits

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

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < Bits) {
        buffer(j) += (((h >>> j) & 1L).toInt * 2) - 1
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < Bits) {
      buffer(j) += other(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (buffer(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * Bits)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Signature width: the hash's portable low bits (62-bit hash → 60
    * used, divisible by the 4-chunk pigeonhole banding).
    */
  val Bits: Int = 60
}

/** Native Count-Min sketch aggregate: `graft_cms(h, depth, width)`
  * over [[PortableHash]] hashes → the depth×width counter matrix as
  * `array<bigint>` (row-major). Row d buckets h at
  * [[PortableHash.perm]]₍d₎(h) mod width; estimate(key) =
  * min over d of counter[d][idx_d(key)] — an OVERcount, never under.
  *
  * This is the mergeable frequency sketch a streaming/sharded
  * heavy-hitter pass uses when the exact q78 groupBy is too wide:
  * counters are pure sums, so partial buffers merge elementwise in
  * ANY order (bit-deterministic — unlike sampling sketches, CMS has
  * no merge-order sensitivity at all), and the fixed depth×width
  * state rides map-side combine. The permutation arithmetic stays in
  * BIGINT range, so the DuckDB oracle rebuilds the identical counters
  * (DedupSimQueries q101).
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"graft_cms depth must be in [1,16], got $depth")
  require(width >= 2, s"graft_cms width must be >= 2, got $width")

  private val as: Array[Long] = Array.tabulate(depth)(PortableHash.permA)
  private val bs: Array[Long] = Array.tabulate(depth)(PortableHash.permB)
  private val cs: Array[Long] = Array.tabulate(depth)(PortableHash.permC)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_cms requires bigint input, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & PortableHash.Mask62
      val hi = h >>> 31
      val lo = h & PortableHash.Mask31
      var d = 0
      while (d < depth) {
        val x = PortableHash.permParts(as(d), bs(d), cs(d), hi, lo)
        buffer(d * width + (x % width).toInt) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) += other(i)
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
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}
