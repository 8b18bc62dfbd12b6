package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-seeded EXACT discrete quantiles.
  *
  * The naive exact plan (`row_number()` over a per-group window) funnels
  * every row of a group through one task's sort — with 3 groups over a
  * 100 TB table, that is three tasks each sorting billions of rows.
  * This operator computes the IDENTICAL exact answer (the value at rank
  * `floor(p·(n-1)) + 1` per group, the reference's discrete-quantile
  * definition) with no full-group sort anywhere in the plan:
  *
  *   1. SKETCH: one `percentile_approx` aggregate per group brackets
  *      each target probability p with band edges at p ± delta. The
  *      returned edges' true ranks are within n/accuracy of their
  *      targets (Greenwald–Khanna guarantee), so once
  *      n·(delta − 1/accuracy) ≥ 2 the exact rank-k value provably
  *      lies inside [lo, hi]; groups too small for that bound use the
  *      exact [gmin, gmax] from the same sketch pass as the band —
  *      bounded by [[SmallGroupLimit]] either way. Shuffles only
  *      partial sketch buffers.
  *   2. COUNT: one exact aggregate over the scan joined with the
  *      broadcast band frame: per group, n plus `count(v < lo_i)` and
  *      `count(lo_i ≤ v ≤ hi_i)` per target. Shuffles one row per
  *      group per partition (map-side partial agg).
  *   3. REFINE: rows falling inside a band — ~2·delta·n per group, the
  *      only rows that ever reach a sort — get a per-(group, target)
  *      `row_number`; the row whose in-band rank equals
  *      `k - count_below` IS the exact quantile value.
  *
  * Every pass is a scan-side pipeline plus a group-cardinality-sized
  * shuffle; the single window sorts only the delta-band.
  *
  * Semantics: quantiles of the NON-NULL values per group (NULL values
  * are excluded at entry and do not count toward n — mixing NULLs
  * into rank arithmetic would silently shift every rank). A group
  * with no non-null values emits no row. The bracket invariant
  * (below < k ≤ below + in-band) is checked by [[bracketViolations]]
  * (asserted in AnalyticsSpec at two SFs + edge groups); were it ever
  * violated, the affected (group, target) value would come out NULL
  * — never a wrong value — and the group row would disappear only if
  * every target's bracket failed.
  *
  * Reference: gerrydb-etl summarizes columns with pandas
  * `describe()`-style exact quantiles (tabular.py report path); this
  * is that semantic re-expressed for a partitioned engine.
  */
object Quantiles {

  /** GK sketch accuracy: rank error ≤ n/Accuracy (= ε·n, ε = 4e-4).
    * Measured at sf0.1: the sketch pass costs ~0.7 s at accuracy
    * 50000/10000 vs ~0.5 s at 2500 with no correctness benefit — the
    * bracket guarantee needs only n·(delta − ε) ≥ 2, i.e. groups of
    * ≥ 3334 rows at these defaults (SmallGroupLimit = 4096 covers the
    * rest via the whole-group band), and the final values are exact
    * regardless (the sketch only PLACES the band; a coarser sketch
    * just widens the refine band to ≤ 2·(delta+ε)·n).
    */
  val DefaultAccuracy = 2500

  /** Half-width of the probability band around each target. The
    * bracket guarantee (Spark's documented percentile_approx rank
    * bound: floor((p−ε)n) ≤ rank ≤ ceil((p+ε)n), plus ≤ 1 rank of
    * slack between the sketch's p·n scale and the discrete target
    * floor(p·(n−1))+1) needs n·(delta−ε) ≥ 2 — i.e. groups of at
    * least ~3334 rows at the defaults. Smaller groups take the
    * [gmin, gmax] fallback band below. The refine sort therefore never
    * sees more than max(~2·delta·n, SmallGroupLimit) rows per
    * (group, target).
    */
  val DefaultDelta = 0.001

  /** Groups smaller than this use the whole group as the band: the
    * sketch guarantee needs n·(delta−ε) ≥ 2 (≈ 3334 rows at the
    * defaults; ~1.2× margin here), and a group this small IS a
    * bounded band — one task sorting ≤ 4096 rows.
    */
  val SmallGroupLimit = 4096L

  /** Exact discrete quantiles of `valueCol` per `groupCol`.
    *
    * Returns one row per group: (group, n, outNames...), where
    * outNames(i) is the exact value at rank `floor(probs(i)·(n-1))+1`
    * — bit-identical to the full-sort definition.
    */
  def exactDiscrete(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      probs: Seq[Double],
      outNames: Seq[String],
      accuracy: Int = DefaultAccuracy,
      delta: Double = DefaultDelta
  ): DataFrame = {
    require(probs.nonEmpty && probs.size == outNames.size, "probs and outNames must align")
    validate(probs, accuracy, delta)
    require(
      !((outNames :+ "n").contains(groupCol)) && outNames.distinct.size == outNames.size,
      "output names (group, n, outNames) must be distinct"
    )
    val refined = refineBands(clean(df, groupCol, valueCol), probs, accuracy, delta)
    // selected row per (group, target): in-band rank == k - below
    val hit = refined.filter(col("rn") === targetRank(probs) - belowOf(probs.size))
    hit
      .groupBy(col(G))
      .agg(
        max(col("n")).as("n"),
        outNames.zipWithIndex.map { case (nm, i) => min(when(col("t") === i, col(V))).as(nm) }: _*
      )
      .withColumnRenamed(G, groupCol)
  }

  /** Largest refine-band size over all (group, target) pairs — the
    * number of rows the rank-selection window actually sorts in one
    * task. The scale contract: ≤ max(2·delta·n + sketch slop,
    * SmallGroupLimit) per pair; asserted empirically in AnalyticsSpec
    * so a delta/accuracy regression (which would quietly re-grow the
    * sorted band toward the whole group) fails a spec.
    */
  def maxBandRows(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      probs: Seq[Double],
      accuracy: Int = DefaultAccuracy,
      delta: Double = DefaultDelta
  ): Long = {
    validate(probs, accuracy, delta)
    val meta = countsAndBands(clean(df, groupCol, valueCol), probs, accuracy, delta)
    val widest =
      if (probs.size == 1) col("cand_0")
      else greatest(probs.indices.map(i => col(s"cand_$i")): _*)
    // coalesce: max over zero groups (empty/all-NULL input) is NULL
    meta.agg(coalesce(max(widest), lit(0L))).head.getLong(0)
  }

  /** Number of (group, target) pairs whose sketch band failed to
    * bracket the exact rank — 0 by the GK guarantee; asserted in CI so
    * a sketch regression fails a spec, not a production run.
    */
  def bracketViolations(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      probs: Seq[Double],
      accuracy: Int = DefaultAccuracy,
      delta: Double = DefaultDelta
  ): Long = {
    validate(probs, accuracy, delta)
    val meta = countsAndBands(clean(df, groupCol, valueCol), probs, accuracy, delta)
    val k = probs.size
    val bad = (0 until k)
      .map { i =>
        val target = floor(lit(probs(i)) * (col("n") - 1)) + 1
        !(col(s"below_$i") < target && target <= col(s"below_$i") + col(s"cand_$i"))
      }
      .reduce(_ || _)
    meta.filter(bad).count()
  }

  // ---- shared internals ----------------------------------------------

  /** Reserved internal names for the (group, value) projection — the
    * caller's own names are dropped at entry so they can never collide
    * with the internal n/rn/t/lo_i/... columns at the meta join, even
    * if the caller's group or value column is itself named `n` or `t`.
    */
  private val G = "__graft_q_g"
  private val V = "__graft_q_v"

  /** Fail fast on parameters that would silently void the bracket
    * guarantee: the band half-width must exceed the sketch's rank
    * error (delta > 1/accuracy, see [[DefaultDelta]]) and every probe
    * must be a probability.
    */
  private def validate(probs: Seq[Double], accuracy: Int, delta: Double): Unit = {
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    require(
      delta > 1.0 / accuracy,
      s"delta ($delta) must exceed 1/accuracy (${1.0 / accuracy}) or the sketch band cannot bracket the exact rank"
    )
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs must lie in [0,1], got $probs")
  }

  /** Entry normalization: project to exactly (group, value) under the
    * reserved [[G]]/[[V]] names — callers may pass wide frames whose
    * columns would collide with the internal n/rn/t/lo_i/... names at
    * the meta join — and drop NULL values (see object doc: ranks are
    * over the non-null population).
    */
  private def clean(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.select(col(groupCol).as(G), col(valueCol).as(V)).filter(col(V).isNotNull)

  /** Pass 1: per-group approximate band edges [lo_i, hi_i] per target,
    * plus the exact group min/max (GK retains both; probes at p=0 and
    * p=1 return them exactly) for the small-group fallback band.
    */
  private def bands(
      df: DataFrame,
      probs: Seq[Double],
      accuracy: Int,
      delta: Double
  ): DataFrame = {
    val probes = probs.flatMap(p => Seq(math.max(p - delta, 0.0), math.min(p + delta, 1.0))) ++ Seq(0.0, 1.0)
    val sketch = df
      .groupBy(col(G))
      .agg(percentile_approx(col(V), array(probes.map(lit): _*), lit(accuracy)).as("pb"))
    sketch.select(
      col(G) +: (probs.indices.flatMap { i =>
        Seq(element_at(col("pb"), 2 * i + 1).as(s"lo_$i"), element_at(col("pb"), 2 * i + 2).as(s"hi_$i"))
      } ++ Seq(
        element_at(col("pb"), 2 * probs.size + 1).as("gmin"),
        element_at(col("pb"), 2 * probs.size + 2).as("gmax")
      )): _*
    )
  }

  /** Pass 2: exact n / below / in-band counts per group, joined back
    * with the band edges (both frames are group-cardinality rows).
    * Groups under [[SmallGroupLimit]] — where the sketch's rank bound
    * cannot promise the bracket — swap to the [gmin, gmax] whole-group
    * band (below := 0, in-band := n), so the bracket holds
    * UNCONDITIONALLY and the band stays bounded either way.
    */
  private def countsAndBands(
      df: DataFrame,
      probs: Seq[Double],
      accuracy: Int,
      delta: Double
  ): DataFrame = {
    val g = col(G)
    val v = col(V)
    val bd = bands(df, probs, accuracy, delta).localCheckpoint()
    val counts = df
      .join(broadcast(bd), G)
      .groupBy(g)
      .agg(
        count(lit(1)).as("n"),
        probs.indices.flatMap { i =>
          Seq(
            sum(when(v < col(s"lo_$i"), 1L).otherwise(0L)).as(s"below_$i"),
            sum(when(v >= col(s"lo_$i") && v <= col(s"hi_$i"), 1L).otherwise(0L)).as(s"cand_$i")
          )
        }: _*
      )
    val sketchSafe = col("n") >= SmallGroupLimit
    counts
      .join(bd, Seq(G))
      .select(
        Seq(g, col("n")) ++ probs.indices.flatMap { i =>
          Seq(
            when(sketchSafe, col(s"lo_$i")).otherwise(col("gmin")).as(s"lo_$i"),
            when(sketchSafe, col(s"hi_$i")).otherwise(col("gmax")).as(s"hi_$i"),
            when(sketchSafe, col(s"below_$i")).otherwise(lit(0L)).as(s"below_$i"),
            when(sketchSafe, col(s"cand_$i")).otherwise(col("n")).as(s"cand_$i")
          )
        }: _*
      )
  }

  /** Pass 3: band rows ranked per (group, target), with the per-group
    * meta columns joined on (broadcast — group-cardinality rows).
    */
  private def refineBands(
      df: DataFrame,
      probs: Seq[Double],
      accuracy: Int,
      delta: Double
  ): DataFrame = {
    val g = col(G)
    val v = col(V)
    // meta is consumed exactly once (the broadcast build below) — no
    // checkpoint; the bands frame inside it IS checkpointed because
    // the sketch pass feeds both the counting agg and the meta join
    val meta = countsAndBands(df, probs, accuracy, delta)
    val inBandTargets = array(probs.indices.map { i =>
      when(v >= col(s"lo_$i") && v <= col(s"hi_$i"), lit(i)).otherwise(lit(-1))
    }: _*)
    val keep: Seq[Column] =
      Seq(g, v, col("n")) ++ probs.indices.map(i => col(s"below_$i")) :+
        explode(filter(inBandTargets, x => x >= 0)).as("t")
    val cands = df.join(broadcast(meta), G).select(keep: _*)
    cands.withColumn("rn", row_number().over(Window.partitionBy(g, col("t")).orderBy(v)))
  }

  /** Exact target rank for the row's target index: floor(p·(n-1))+1. */
  private def targetRank(probs: Seq[Double]): Column =
    probs.indices.tail.foldLeft(
      when(col("t") === 0, floor(lit(probs.head) * (col("n") - 1)) + 1)
    )((acc, i) => acc.when(col("t") === i, floor(lit(probs(i)) * (col("n") - 1)) + 1))

  /** The row's target's exact below-band count. */
  private def belowOf(k: Int): Column =
    (1 until k).foldLeft(when(col("t") === 0, col("below_0")))((acc, i) =>
      acc.when(col("t") === i, col(s"below_$i"))
    )
}
