package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed k-th order statistic over a long column, without
  * materializing k rows anywhere.
  *
  * Why it exists: the two-level k-means seed set is "the k smallest
  * vec_ids present" with k = N/target corpus-scaled (KMeans.scala).
  * `orderBy(id).limit(k)` computes that as a driver-side TakeOrdered —
  * a k-row heap on ONE machine, which at warehouse scale (k ≈ 10⁹ for
  * a 10¹¹-vector corpus) is gigabytes of driver memory for what is
  * conceptually a single cutoff value. This finds the exact k-th
  * smallest value by ITERATIVE HISTOGRAM NARROWING instead: each round
  * is one `groupBy(bucket).count()` aggregate over the (pushdown-
  * pruned, single-column) scan restricted to the surviving value
  * range, the driver holds only the ≤4096-row histogram, and the range
  * shrinks ~4096× per round — ≤6 rounds for the full 64-bit domain,
  * each a map-side-combined shuffle of ≤4096 rows per partition. The
  * final remnant (≤65536 rows by construction) is collected and
  * indexed locally. Seeds then materialize as `filter(id <= cutoff)` —
  * a distributed predicate the scan pushes down, no k-row heap, no
  * broadcast join.
  *
  * Duplicates are handled (multiset rank semantics); the k-means
  * seeding call site has unique vec_ids, where `filter(v <= kth)`
  * returns exactly k rows.
  */
object OrderStatistic {

  /** Histogram fan-out per round and the remnant size the final local
    * sort is allowed to touch. 4096 buckets × 8-byte counts keeps the
    * per-round driver state at a few KB; 65536 longs = 512 KB once.
    */
  val Buckets = 4096L
  val CollectCap = 65536L

  /** The exact k-th smallest (1-indexed, multiset rank) value of
    * `column` in `df`. Requires 1 ≤ k ≤ count and a non-null column;
    * raises loudly otherwise. `buckets`/`collectCap` are the test
    * hooks that force multi-round narrowing on small inputs — the
    * production defaults only enter the loop past 65536 rows, which
    * is exactly how the double-typed bucket id (Spark's `/` on longs
    * is DOUBLE division) survived a spec that never left the
    * collect-everything fast path and detonated first at the 128×
    * scaling point.
    */
  def kthSmallest(
      df: DataFrame,
      column: String,
      k: Long,
      buckets: Long = Buckets,
      collectCap: Long = CollectCap
  ): Long = {
    require(k >= 1, s"order statistic needs k >= 1; got $k")
    require(buckets >= 2 && collectCap >= 1, s"need buckets >= 2, collectCap >= 1; got $buckets/$collectCap")
    val v = df.select(col(column).cast("long").as("v"))
    val head = v.agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi")).head()
    val n = head.getLong(0)
    require(n >= k, s"order statistic k=$k exceeds the $n non-null rows of '$column'")
    var lo = head.getLong(1)
    var hi = head.getLong(2)
    // guard the (value - lo) bucket arithmetic against 64-bit overflow;
    // every id space in the engine is non-negative, so this never fires
    // in practice and a pathological corpus fails loudly
    require(
      lo >= -(Long.MaxValue / 4) && hi <= Long.MaxValue / 4,
      s"order statistic expects values in [-2^61, 2^61]; got range [$lo, $hi]"
    )
    var rank = k
    var inRange = n
    while (inRange > collectCap && hi > lo) {
      val width = (hi - lo) / buckets + 1
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and
      // doubles lose exactness past 2^53 — bucket ids must be exact
      // integral quotients at any id magnitude
      val hist = v
        .filter(col("v") >= lo && col("v") <= hi)
        .groupBy(expr(s"(v - (${lo}L)) div ${width}L").as("b")) // v >= lo in-range, so div == floor
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      var cum = 0L
      var picked = -1L
      var pickedCount = 0L
      for ((b, c) <- hist if picked < 0) {
        if (cum + c >= rank) { picked = b; pickedCount = c }
        else cum += c
      }
      // rank <= inRange = Σ counts, so a bucket is always found
      rank -= cum
      val newLo = lo + picked * width
      hi = math.min(hi, newLo + width - 1)
      lo = newLo
      inRange = pickedCount
    }
    if (hi == lo) lo // a single surviving value (any multiplicity) IS the answer
    else {
      val remnant = v
        .filter(col("v") >= lo && col("v") <= hi)
        .collect()
        .map(_.getLong(0))
        .sorted
      remnant(rank.toInt - 1)
    }
  }
}
