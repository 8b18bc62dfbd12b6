package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

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
