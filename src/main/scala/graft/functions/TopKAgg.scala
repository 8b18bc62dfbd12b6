package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `graft_topk(key, id, k)` → the ids
  * of the k SMALLEST (key, id) pairs in the group, as `array<bigint>`
  * sorted ascending by (key, id) — position+1 is the rank.
  *
  * Why a custom aggregate (SURVEY preference tier b): per-group top-k
  * is usually written as a `row_number()` window, which shuffles and
  * SORTS every row of every group — the q45 scale-killer shape when
  * groups are large and few. A bounded heap is the aggregation-form
  * of the same answer: O(k) state per group, map-side partial
  * aggregation (each task keeps its local top-k, merge unions two
  * heaps and trims), ONE shuffle of k-sized states, no sort of the
  * group anywhere. Content is order-independent (the k smallest of a
  * multiset is a well-defined set under the total (key, id) order),
  * so the result is deterministic under any partitioning / merge
  * order — asserted in PropertySpec by re-running under shuffled
  * partitionings.
  *
  * Null keys/ids are skipped (a null sort key cannot rank).
  */
case class TopKAgg(
    key: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  // max-heap on (key, id): head = worst kept pair, evicted first
  private implicit val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def children: Seq[Expression] = Seq(key, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (kt, it) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk requires (double, bigint) inputs, got (${kt.simpleString}, ${it.simpleString})"
        )
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)]

  private def offer(buffer: mutable.PriorityQueue[(Double, Long)], pair: (Double, Long)): Unit =
    if (buffer.size < k) buffer.enqueue(pair)
    else if (ord.lt(pair, buffer.head)) {
      buffer.dequeue()
      buffer.enqueue(pair)
    }

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow
  ): mutable.PriorityQueue[(Double, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) offer(buffer, (kv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]
  ): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    // dequeueAll drains worst-first; reverse → ascending (key, id).
    // Clone: eval must not destroy the live buffer.
    val sorted = buffer.clone().dequeueAll.reverse
    new GenericArrayData(sorted.map(_._2).toArray)
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach { case (kv, iv) => bb.putDouble(kv); bb.putLong(iv) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = mutable.PriorityQueue.empty[(Double, Long)]
    var i = 0
    while (i < n) {
      q.enqueue((bb.getDouble, bb.getLong))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(key = newChildren.head, id = newChildren(1))
}
