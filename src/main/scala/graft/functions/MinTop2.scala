package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native top-2 minimum aggregate: `graft_min2(key, id)` over BIGINT
  * pairs → `array<bigint>` [k1, id1, k2, id2] — the two smallest
  * (key, id) pairs in lexicographic order with DISTINCT ids (a worse
  * entry of an id already held is dominated and ignored). Empty slots
  * hold Long.MaxValue sentinels (keys here are squared distances and
  * ids are vec_ids — both non-negative, so the sentinel is
  * unambiguous).
  *
  * Why a custom aggregate (SURVEY preference tier b): the multi-probe
  * cell assignment (KMeans.assignMultiProbe) needs each vector's TWO
  * nearest centroids, and `min(struct(d2, cid))` only yields one. The
  * SQL alternatives either window-sort the full N·√k candidate
  * fan-out (a shuffle of every candidate row where this aggregate's
  * map-side partials collapse to ≤2 entries per vector per partition)
  * or re-join the argmin back onto the candidates (a second N·√k
  * shuffle). Same lexicographic (key, id) order as min(struct(key,
  * id)) and the oracle's `ORDER BY d2, cid` window, so the three
  * formulations cannot disagree on ties.
  */
case class MinTop2Agg(
    key: Expression,
    id: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(key, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_min2"

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (k, i) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_min2 requires (bigint, bigint), got (${k.simpleString}, ${i.simpleString})"
        )
    }

  override def createAggregationBuffer(): Array[Long] =
    Array(Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue)

  @inline private def less(k: Long, i: Long, k2: Long, i2: Long): Boolean =
    k < k2 || (k == k2 && i < i2)

  private def offer(buffer: Array[Long], k: Long, i: Long): Unit = {
    if (i == buffer(1)) {
      // same id as slot 1: keep the better entry; order vs slot 2 is
      // unaffected (slot 1 can only improve)
      if (less(k, i, buffer(0), buffer(1))) buffer(0) = k
    } else if (i == buffer(3)) {
      if (less(k, i, buffer(2), buffer(3))) {
        buffer(2) = k
        if (less(buffer(2), buffer(3), buffer(0), buffer(1))) {
          val (k1, i1) = (buffer(0), buffer(1))
          buffer(0) = buffer(2); buffer(1) = buffer(3)
          buffer(2) = k1; buffer(3) = i1
        }
      }
    } else if (less(k, i, buffer(0), buffer(1))) {
      buffer(2) = buffer(0); buffer(3) = buffer(1)
      buffer(0) = k; buffer(1) = i
    } else if (less(k, i, buffer(2), buffer(3))) {
      buffer(2) = k; buffer(3) = i
    }
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) offer(buffer, kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other(1) != Long.MaxValue || other(0) != Long.MaxValue) offer(buffer, other(0), other(1))
    if (other(3) != Long.MaxValue || other(2) != Long.MaxValue) offer(buffer, other(2), other(3))
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 4)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinTop2Agg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinTop2Agg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinTop2Agg =
    copy(key = newChildren.head, id = newChildren(1))
}
