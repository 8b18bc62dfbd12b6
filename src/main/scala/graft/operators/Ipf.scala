package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point iterative proportional fitting — the mixture-weight
  * solver behind "rebalance the corpus so source AND quality-band
  * marginals both hit their targets" (the two-constraint version of
  * q70/q94's one-dimensional source mixing, the DoReMi-ish reweighting
  * shape). The engine's third fixed-iteration algorithm family, next
  * to PageRank (graphs) and KMeans (ML).
  *
  * Everything after the ONE corpus-sized cell count is cell-frame
  * arithmetic (|dimA|·|dimB| rows). Weights live in integer BASIS
  * POINTS and every scaling step is BIGINT multiply + floor `div` —
  * order-free, so the result is bit-deterministic under any
  * partitioning and a SQL oracle unrolls the identical rounds
  * (q97/q119 pattern). Declared contract: fixed-point IPF (floor
  * division each step) rather than real-valued IPF — the ~1e-4
  * relative truncation per step is far below any mixing decision's
  * tolerance, and exactness-of-reproduction is what a pipeline wants
  * from its weight solver. Targets are UNIFORM marginals (total/|dim|
  * weighted docs per value) in this form; a targeted variant swaps the
  * two 1-row target frames.
  *
  * At 100 TB-scale counts (≥1e12 docs) the bp products approach 2⁶³ —
  * production would drop the weight scale to 10² or run the cell
  * frame (thousands of rows) through DecimalType; the shape is
  * unchanged.
  */
object Ipf {

  /** Weight scale: 10⁴ = basis points. */
  val WeightScale = 10000L

  /** `cells`: one row per (dimA, dimB) with integer count `nCol`.
    * Returns the cells with a final `w_bp` after `rounds` full
    * (dimA-step, dimB-step) rounds from a flat w=WeightScale start.
    */
  def fitUniform(cells: DataFrame, dimA: String, dimB: String, nCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val totals = cells
      .agg(
        sum(col(nCol)).as("total"),
        countDistinct(col(dimA)).as("na"),
        countDistinct(col(dimB)).as("nb")
      )
      .select(
        expr(s"(total * $WeightScale) div na").as("tgt_a"),
        expr(s"(total * $WeightScale) div nb").as("tgt_b")
      )
      .localCheckpoint()
    var c = cells
      .select(col(dimA), col(dimB), col(nCol).cast("long").as("n"))
      .withColumn("w_bp", lit(WeightScale))
      .localCheckpoint()
    // the updated weight is clamped to ≥ 1 bp: floor division would
    // otherwise drive w_bp to 0 for cells more than ~WeightScale× (10⁴)
    // over-represented vs their dim target, and once EVERY cell of a
    // dim value hits 0 that marginal is 0 and the next `div` yields
    // NULL (non-ANSI), silently poisoning all downstream weights. The
    // clamp keeps every marginal positive (n ≥ 1 per cell by
    // construction), costs one `greatest` in the projection, and is
    // mirrored in the oracle — so the fixed-point contract stays
    // bit-deterministic. Note this bounds per-round down-correction at
    // 10⁴×; imbalances beyond it converge over extra rounds (next to
    // the 2^63 overflow note: |w_bp·tgt| ≤ 10⁴·total·10⁴ stays exact).
    def step(dim: String, tgt: String): DataFrame = {
      val marg = c.groupBy(col(dim)).agg(sum(col("n") * col("w_bp")).as("marg"))
      c.join(broadcast(marg), dim)
        .crossJoin(broadcast(totals))
        .select(
          col(dimA),
          col(dimB),
          col("n"),
          greatest(lit(1L), expr(s"(w_bp * $tgt) div marg")).as("w_bp")
        )
    }
    for (_ <- 1 to rounds) {
      c = step(dimA, "tgt_a").localCheckpoint()
      c = step(dimB, "tgt_b").localCheckpoint()
    }
    c
  }
}
