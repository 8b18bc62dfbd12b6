package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Deterministic per-group top-k-by-hash sampling.
  *
  * Semantics: for each group, the k rows with the smallest
  * (md5-prefix, id) — a uniform, reproducible k-sample (the md5 coin
  * of q44/q70, so re-running selects the same rows, across engines).
  *
  * The naive plan — `row_number()` over a per-group window — funnels
  * EVERY row of a group through one task's sort; with a handful of
  * groups over 100 TB that is the q45 scale-killer again. This
  * operator keeps the answer EXACTLY equal to the naive definition
  * while sorting only a bounded survivor set:
  *
  *   1. COUNT: one aggregate → n_g per group (broadcast back).
  *   2. GATE: keep rows whose 32-bit hash prefix falls under
  *      ceil(oversample·k·2³²/n_g) — expected oversample·k survivors
  *      per group; groups with n_g ≤ oversample·k skip the gate
  *      entirely (sentinel "g" sorts after every hex digit). The gate
  *      is a scan-side comparison of the md5 prefix against a
  *      PRE-RENDERED hex literal — the same lexicographic-hex trick
  *      as q44, portable to any engine.
  *   3. SELECT: rank the survivors per group; the top-k of the
  *      survivors IS the top-k of the group whenever the group kept
  *      at least k survivors (the gate keeps a hash-PREFIX of the
  *      group's order, so no selected row can be lost).
  *
  * The gate-keeps-≥k invariant is probabilistic (P[Binomial(n, 4k/n)
  * < k] < 10⁻¹⁰ at the defaults) but VERIFIABLE: [[underflowGroups]]
  * counts violating groups — asserted zero in CI at two SFs, and a
  * production run can gate on it exactly like Quantiles'
  * bracketViolations. On violation the affected group returns fewer
  * than k rows (never wrong rows).
  */
object Sampling {

  /** Survivor budget multiplier: the gate targets oversample·k
    * expected survivors per group. 4 puts the underflow probability
    * (Chernoff: exp(-(3/4)²·4k/2) ≈ e⁻¹¹ at k=10) below any practical
    * concern while the sorted set stays tiny.
    */
  val DefaultOversample = 4

  private val TwoTo32 = 4294967296L

  /** Hex-rendered gate threshold per group, given the group-count
    * column: ceil-free integer division (the +n_g-1 makes the
    * expected-survivor bound conservative), or the keep-all sentinel
    * when the whole group fits in the survivor budget.
    */
  private def gateHex(nG: Column, k: Int, oversample: Int): Column = {
    val budget = lit(k.toLong * oversample)
    // floor-of-double, not SQL `/`: Spark's `/` on longs returns
    // DOUBLE (format_string("%08x") then throws at runtime — and only
    // for groups past the keep-all budget, so small fixtures never see
    // it). floor can land one 2⁻³² step high for groups past ~2²⁰
    // rows (quotient within an ulp of an integer); the gate is a
    // survivor-budget heuristic, so a ±1 threshold step only nudges
    // the expected survivor count — sample exactness rests on the
    // survivors-≥-k invariant, not on the threshold value.
    when(nG <= budget, lit("g"))
      .otherwise(lower(format_string("%08x", floor((budget * TwoTo32 + nG - 1) / nG).cast("long"))))
  }

  /** The k-per-group sample: (group, id, h, rank), rank 1..k by
    * (md5-prefix, id). `hashCol` is the column the md5 coin hashes —
    * the row's content key (hash the CONTENT, not the id, so two
    * ingests of the same corpus with different id assignments still
    * sample the same rows).
    */
  def topKByHash(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      hashCol: String,
      k: Int,
      oversample: Int = DefaultOversample
  ): DataFrame = {
    require(k > 0 && oversample > 0, s"k and oversample must be positive, got k=$k oversample=$oversample")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n_g"))
    val gates = counts.select(col(groupCol), gateHex(col("__n_g"), k, oversample).as("__thr"))
    val survivors = df
      .select(col(groupCol), col(idCol), substring(md5(col(hashCol)), 1, 8).as("h"))
      .join(broadcast(gates), groupCol)
      .filter(col("h") < col("__thr"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"), col(idCol))
    survivors
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol), col("h"), col("rank"))
  }

  /** 2⁵² as a double — the md5 13-hex-digit prefix is 52 bits, so the
    * uniform u = (v + 0.5) / 2⁵² is EXACT double arithmetic in any
    * engine (no rounding before the ln).
    */
  val TwoTo52: Double = 4503599627370496.0

  /** The E-S key as a Column: -ln(u)/w with u from the 52-bit md5
    * prefix — portable to any engine with md5 + ln.
    */
  def esKey(hashCol: Column, weightCol: Column): Column = {
    val u = (conv(substring(md5(hashCol), 1, 13), 16, 10).cast("long").cast("double") + lit(0.5)) / lit(TwoTo52)
    -log(u) / weightCol.cast("double")
  }

  /** Deterministic WEIGHTED k-sample per group, without replacement —
    * Efraimidis–Spirakis: each row draws u from the md5 coin and keys
    * itself with -ln(u)/w; the k smallest keys per group are a sample
    * where P(row selected) scales with its weight (quality- or
    * length-proportional sampling, the training-data shape). This is
    * the aggregated form: (groupCol, sample_ids array<bigint>), ids
    * ascending by E-S key; [[weightedTopK]] explodes it to
    * (groupCol, idCol, rank).
    *
    * Scale shape: NOT the per-group `row_number()` window (the q45
    * scale-killer) and not even the gated window of [[topKByHash]] —
    * the whole selection is ONE native bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): O(k) state per group, map-side
    * partial aggregation, one shuffle of k-sized heaps, no sort of
    * any group anywhere. The md5-derived key makes the sample
    * reproducible across engines and runs (the DuckDB oracle computes
    * the identical key and window-ranks it — correct there, because
    * the oracle only ever runs at test scale). Stream-safe: a
    * streaming groupBy carries the k-sized heap buffer in state, and
    * heap content is merge-order independent, so stream ≡ batch
    * (asserted in StreamingSpec).
    *
    * Rows with weight ≤ 0 are excluded (they cannot be sampled: the
    * E-S key is undefined); rows whose key or id is NULL are skipped
    * by the aggregate (a null sort key cannot rank).
    */
  def weightedTopKHeaps(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      hashCol: String,
      weightCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // the heap carries long ids; a silent cast of a string id column
    // would yield NULLs that TopKAgg skips — the caller would get
    // EMPTY samples instead of an error (r7 advice). Enforce the
    // bigint-id contract loudly.
    val idType = df.schema(idCol).dataType
    require(
      Seq(types.LongType, types.IntegerType, types.ShortType, types.ByteType).contains(idType),
      s"weightedTopKHeaps requires an integral id column; '$idCol' is $idType " +
        "(hash or dictionary-encode non-numeric ids to bigint first)"
    )
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.filter(col(weightCol) > 0)
      .select(col(groupCol), esKey(col(hashCol), col(weightCol)).as("__k"), col(idCol).cast("long").as("__id"))
      .groupBy(col(groupCol))
      .agg(graft.functions.GraftFunctions.topk(col("__k"), col("__id"), k).as("sample_ids"))
  }

  def weightedTopK(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      hashCol: String,
      weightCol: String,
      k: Int
  ): DataFrame =
    weightedTopKHeaps(df, groupCol, idCol, hashCol, weightCol, k)
      .select(col(groupCol), posexplode(col("sample_ids")).as(Seq("__pos", idCol)))
      .select(col(groupCol), col(idCol), (col("__pos") + 1).cast("long").as("rank"))

  /** Groups whose gate kept fewer than min(k, n_g) survivors — the
    * sample-completeness invariant. 0 by the Chernoff bound; asserted
    * in CI so a gate regression (or a pathological corpus) fails a
    * spec, not a silent short sample.
    *
    * Counted from the COUNTS side (left join of kept survivors onto
    * the per-group totals): aggregating the survivor stream alone
    * cannot see a group whose gate kept ZERO rows — the one extreme
    * failure mode this check exists to catch would silently pass
    * (r7 advice).
    */
  def underflowGroups(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      hashCol: String,
      k: Int,
      oversample: Int = DefaultOversample
  ): Long = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n_g"))
    val gates = counts.select(col(groupCol), col("__n_g"), gateHex(col("__n_g"), k, oversample).as("__thr"))
    val kept = df
      .select(col(groupCol), substring(md5(col(hashCol)), 1, 8).as("h"))
      .join(broadcast(gates.select(col(groupCol), col("__thr"))), groupCol)
      .filter(col("h") < col("__thr"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("kept"))
    counts
      .join(kept, Seq(groupCol), "left_outer")
      .filter(coalesce(col("kept"), lit(0L)) < least(lit(k.toLong), col("__n_g")))
      .count()
  }
}
