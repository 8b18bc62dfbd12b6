package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving document for the streaming shard packer. */
case class PackDoc(doc_id: Long, source: String, n_toks: Long)

/** A doc's shard assignment — schema-aligned with batch q71. */
case class PackAssignment(doc_id: Long, source: String, n_toks: Long, shard_id: Long)

/** Streaming twin of q71's token-budget shard packing — the index-
  * maintenance story for training shards: as a crawl delivers new
  * documents, each is assigned its shard THE MOMENT IT ARRIVES, and
  * the assignment must equal what a batch re-pack of the whole corpus
  * would produce (otherwise the incremental shard layout silently
  * diverges from a rebuild — the q87/q104 invariant, applied to
  * packing).
  *
  * State per source is ONE long (the running token total): the
  * smallest possible maintenance state, updated by
  * flatMapGroupsWithState in update mode. Ingest contract (same as
  * the edge-table and signature ingest paths): docs arrive in
  * ascending doc_id order per source across micro-batches — shard
  * packing is defined over the corpus ORDER, so an out-of-order
  * arrival would need re-assignment of everything after it in any
  * engine. Within a micro-batch the group iterator is sorted here, so
  * intra-batch arrival order does not matter.
  */
object Packing {

  def shardAssignments(
      docs: Dataset[PackDoc],
      budget: Long
  ): Dataset[PackAssignment] = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    def update(
        source: String,
        batch: Iterator[PackDoc],
        state: GroupState[Long]
    ): Iterator[PackAssignment] = {
      var cum = state.getOption.getOrElse(0L)
      val out = batch.toArray.sortBy(_.doc_id).map { d =>
        val start = cum
        cum += d.n_toks
        PackAssignment(d.doc_id, source, d.n_toks, start / budget)
      }
      state.update(cum)
      out.iterator
    }

    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
