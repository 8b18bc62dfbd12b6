package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven FIXED-POINT linear model scoring.
  *
  * The fastText-style quality filters in front of a training corpus
  * are linear models over cheap integer features; evaluating them as
  * `sigmoid(w·x)` doubles makes the keep/drop decision hostage to
  * libm ulps (exp differs across engines), so graft keeps the whole
  * decision in exact BIGINT arithmetic: weights are integer basis
  * points, the score is one integer expression tree, and the
  * threshold compares integers — bit-identical on every engine and
  * every partitioning. Sigmoid is monotonic, so thresholding the
  * linear term IS thresholding the probability; calibrate the
  * threshold, not the output.
  *
  * The weight list → Column-tree fold mirrors the reference's
  * config-driven column specs (gerrydb-etl `__init__.py` ColumnConfig
  * — declarative column recipes applied mechanically): models ship as
  * DATA, the plan stays whole-stage-codegen'd scan-side arithmetic
  * with no UDF anywhere.
  */
object LinearModel {

  /** `bias + Σ w_i · feature_i` in basis points, as one exact BIGINT
    * expression over already-computed integer feature columns. NULL
    * features poison the row's score to NULL (surface the gap, don't
    * silently zero it); coalesce upstream if absence means zero.
    */
  def scoreBp(bias: Long, weights: Seq[(String, Long)]): Column = {
    require(weights.nonEmpty, "a linear model needs at least one feature weight")
    require(weights.map(_._1).distinct.size == weights.size, "duplicate feature in weights")
    weights.foldLeft(lit(bias)) { case (acc, (f, w)) => acc + lit(w) * col(f).cast("long") }
  }

  /** The same fold rendered as ANSI SQL (for oracle parity checks). */
  def scoreBpSql(bias: Long, weights: Seq[(String, Long)]): String =
    weights.map { case (f, w) => s"$w * $f" }.mkString(s"$bias + ", " + ", "")
}
