package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Distributed prefix sum (running total).
  *
  * The naive plan — `sum(v).over(Window.partitionBy(g).orderBy(o))` —
  * funnels EVERY row of a group through one task's sort. A training
  * corpus has a handful of sources; at 100 TB that window is three
  * tasks each sorting tens of terabytes — the same serial-sort
  * scale-killer the banded quantile refinement (Quantiles.scala)
  * exists to avoid. This operator computes the IDENTICAL running
  * total with the classic two-pass scheme, all buckets in parallel:
  *
  *   1. BOUNDS: one min/max/null-count aggregate over the order
  *      column (answered largely from parquet footer stats), read
  *      driver-side — the bounds become plan literals, and the read
  *      enforces the non-null order-key contract loudly.
  *   2. BUCKET: rows map to `buckets` equal-width ranges of the order
  *      column — a pure scan-side integer expression, no shuffle.
  *      The bucket is `(key - lo) DIV width` with a driver-computed
  *      `width = span/buckets + 1 ≥ 1`, which cannot overflow for any
  *      key span that itself fits in a Long (the span is checked as a
  *      BigInt — a nanosecond-timestamp span over centuries stays
  *      exact where the algebraically-equal `(key-lo)*buckets DIV
  *      (span+1)` form would overflow the multiply at ~2^57).
  *   3. INTRA: the running sum WITHIN each (group, bucket) — a window
  *      whose partition key carries the bucket, so its sort handles
  *      ~n/buckets rows per task instead of a whole group.
  *   4. OFFSET: per-(group, bucket) totals (map-side partial agg, one
  *      row per group×bucket) get their own tiny running sum; the
  *      exclusive bucket offset rides back onto the scan as a
  *      broadcast join. cum = offset + intra.
  *
  * Equal-width bucketing means balance follows the order column's
  * distribution — exact for dense ids (graft's doc_id), and callers
  * with skewed order keys should pass a rank-like surrogate. The
  * answer itself is bucket-independent either way; only task balance
  * moves.
  *
  * Semantics match the plain window exactly for a non-null integral
  * or decimal `valueCol`: ties in the order column share one running
  * total (RANGE frame — ties land in the same bucket by construction,
  * so the frame never splits), and the order column must be non-null
  * integral (enforced loudly — a silent `cast` of a string key would
  * bucket everything to NULL and return an empty frame). Two declared
  * divergences outside that contract: DOUBLE values re-associate
  * (bucket partials sum in a different order than the row-at-a-time
  * window), and a row with only NULL values at-or-before it in its
  * bucket gets `offset + 0` where the plain window can yield NULL.
  */
object Prefix {

  val DefaultBuckets = 64

  def cumSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      outCol: String = "cum",
      buckets: Int = DefaultBuckets
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val reserved = Seq("__graft_p_b", "__graft_p_c", "__graft_p_t", "__graft_p_off")
    require(
      !(df.columns ++ Seq(outCol)).exists(reserved.contains),
      s"columns ${reserved.mkString(", ")} are reserved by Prefix.cumSum"
    )
    require(!df.columns.contains(outCol), s"output column '$outCol' already exists in the input")
    val orderType = df.schema(orderCol).dataType
    require(
      Seq(types.LongType, types.IntegerType, types.ShortType, types.ByteType).contains(orderType),
      s"Prefix.cumSum requires an integral order column; '$orderCol' is $orderType " +
        "(rank or dictionary-encode other key types first)"
    )

    // the 1-row bounds aggregate runs once and is read driver-side:
    // lo/width become plan literals (no broadcast needed in either
    // scan pass), and the null-key count makes the non-null contract
    // an actual loud failure — a null order key would otherwise get a
    // null bucket and be SILENTLY dropped by the offset equi-join
    val boundsRow = df
      .agg(
        min(col(orderCol)).cast("long").as("lo"),
        max(col(orderCol)).cast("long").as("hi"),
        count(lit(1)).as("n"),
        count(col(orderCol)).as("nn")
      )
      .head()
    val nullKeys = boundsRow.getLong(2) - boundsRow.getLong(3)
    require(
      nullKeys == 0,
      s"Prefix.cumSum: $nullKeys NULL '$orderCol' order keys — the non-null order-key " +
        "contract (see scaladoc) would silently drop them; filter or impute first"
    )
    val emptyInput = boundsRow.getLong(2) == 0
    val lo = if (emptyInput) 0L else boundsRow.getLong(0)
    val span = if (emptyInput) BigInt(0) else BigInt(boundsRow.getLong(1)) - BigInt(lo)
    require(
      span <= BigInt(Long.MaxValue) - 1,
      s"Prefix.cumSum: '$orderCol' spans $span > Long range — (key - lo) would overflow; " +
        "rank or rebase the order key first"
    )
    // DIV with a driver-computed width ≥ 1: exact integer bucketing
    // (a double divide would put boundary rows in the wrong bucket and
    // silently skew offsets) that cannot overflow — see scaladoc
    val width = (span / buckets + 1).toLong
    val bucketExpr =
      least(
        lit(buckets - 1L),
        expr(s"(cast($orderCol as bigint) - ${lo}L) DIV ${width}L")
      ).cast("long")

    val bucketed = df.withColumn("__graft_p_b", bucketExpr)

    val groupRefs = groupCols.map(col)
    // bucket totals from a second pruned scan pass: deriving them from
    // the window output instead would either recompute the window per
    // consumer or force a full-data checkpoint — a pruned scan + map-side
    // partial agg is the cheap side of that trade at any scale
    val totals = bucketed
      .groupBy((groupRefs :+ col("__graft_p_b")): _*)
      .agg(sum(col(valueCol)).as("__graft_p_t"))
    val offW = Window.partitionBy(groupRefs: _*).orderBy(col("__graft_p_b"))
    val offsets = totals
      .select(
        (groupRefs :+ col("__graft_p_b") :+
          (coalesce(sum(col("__graft_p_t")).over(offW), lit(0L)) - coalesce(col("__graft_p_t"), lit(0L)))
            .as("__graft_p_off")): _*
      )

    val intraW = Window.partitionBy((groupRefs :+ col("__graft_p_b")): _*).orderBy(col(orderCol))
    bucketed
      .withColumn("__graft_p_c", sum(col(valueCol)).over(intraW))
      .join(broadcast(offsets), groupCols :+ "__graft_p_b")
      .withColumn(outCol, col("__graft_p_off") + coalesce(col("__graft_p_c"), lit(0L)))
      .drop("__graft_p_b", "__graft_p_c", "__graft_p_off")
  }
}
