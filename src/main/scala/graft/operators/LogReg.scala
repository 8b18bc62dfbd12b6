package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point logistic-regression TRAINING — the solver that produces
  * the weights [[graft.etl.LinearModel]] scores with (q112), closing
  * the quality-filter loop: train on labeled docs here, ship the
  * learned `(feature, w_bp)` rows as the config-driven model there.
  * The engine's fourth fixed-iteration algorithm family, next to
  * PageRank (graphs), KMeans (clustering) and Ipf (reweighting).
  *
  * Real logistic regression's sigmoid/exp makes every gradient hostage
  * to libm ulps, so the round update uses the HARD sigmoid (the
  * standard piecewise-linear surrogate): p_bp = clamp(5000 + z div
  * ZDiv, 0, 10000) with z in basis points. From there every step is
  * exact BIGINT arithmetic — truncating `div` agrees between Spark and
  * DuckDB for negative operands too (both truncate toward zero) — so
  * T rounds are bit-deterministic under any partitioning and a SQL
  * oracle unrolls the identical rounds (the q97/q119/q121 pattern).
  *
  * Per round the corpus contributes ONE map-side-combinable aggregate
  * (count + one err·x sum per feature → a single row); the weight
  * state is a 1-row frame broadcast back against the feature scan and
  * localCheckpoint'd per round (constant-size lineage cut). At 100 TB
  * the per-iteration cost is exactly one scan + one 1-row shuffle —
  * the same shape as KMeans' update step, with K·D collapsed to F+1.
  *
  * Overflow contract: |err| ≤ 10⁴, so a feature bounded by B keeps the
  * per-partition partial sums exact while n·B < 2⁶³/10⁴ ≈ 9·10¹⁴ —
  * beyond that (quadrillions of feature units per round) drop LrDiv's
  * scale or pre-average per shard. Gradient means use truncating
  * integral division (declared contract, mirrored in the oracle).
  */
object LogReg {

  /** Probability scale: 10⁴ = basis points. */
  val ProbScale = 10000L

  /** Hard-sigmoid slope divisor: p moves one bp per ZDiv bp of z. */
  val ZDiv = 400L

  /** Learning-rate divisor applied to the per-row mean gradient. */
  val LrDiv = 1000L

  /** Train T rounds of hard-sigmoid logistic regression from a zero
    * start. `feats` must carry integer feature columns `xCols` and a
    * 0/1 label `yCol`. Returns `(feature, w_bp)` — one row per
    * feature plus a `bias` row — ready for
    * [[graft.etl.LinearModel.scoreBp]].
    */
  def trainHardSigmoid(feats: DataFrame, xCols: Seq[String], yCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(xCols.nonEmpty, "need at least one feature column")
    require(xCols.distinct.size == xCols.size, "duplicate feature column")
    require(!xCols.contains("bias"), "'bias' is reserved for the intercept row")
    val spark = feats.sparkSession
    // the feature frame is re-scanned once per round (the Lloyd-term
    // contract); checkpoint so the regex/feature extraction runs once
    // and each round reads materialized blocks
    val f = feats
      .select(xCols.map(c => col(c).cast("long").as(c)) :+ col(yCol).cast("long").as("y"): _*)
      .localCheckpoint()
    var w = spark
      .range(1)
      .select(lit(0L).as("b") +: xCols.indices.map(i => lit(0L).as(s"w_$i")): _*)
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val z = xCols.zipWithIndex.foldLeft(col("b")) { case (acc, (c, i)) => acc + col(s"w_$i") * col(c) }
      val scored = f
        .crossJoin(broadcast(w))
        .withColumn("z", z)
        .withColumn("p", greatest(lit(0L), least(lit(ProbScale), lit(ProbScale / 2) + expr(s"z div $ZDiv"))))
        .withColumn("err", col("p") - lit(ProbScale) * col("y"))
      val grads = scored.agg(
        count(lit(1)).as("n"),
        sum(col("err")).as("g_b") +: xCols.zipWithIndex.map { case (c, i) => sum(col("err") * col(c)).as(s"g_$i") }: _*
      )
      w = grads
        .crossJoin(broadcast(w))
        .select(
          expr(s"b - (g_b div n) div $LrDiv").as("b") +:
            xCols.indices.map(i => expr(s"w_$i - (g_$i div n) div $LrDiv").as(s"w_$i")): _*
        )
        .localCheckpoint()
    }
    w.select(
      explode(
        array(
          struct(lit("bias").as("feature"), col("b").as("w_bp")) +:
            xCols.zipWithIndex.map { case (c, i) => struct(lit(c).as("feature"), col(s"w_$i").as("w_bp")) }: _*
        )
      ).as("kv")
    ).select(col("kv.feature").as("feature"), col("kv.w_bp").as("w_bp"))
  }
}
