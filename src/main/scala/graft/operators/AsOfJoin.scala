package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, the single latest
  * right row with right.ts <= left.ts within the same key.
  *
  * Spark has no native as-of join; the naive formulation is an
  * inequality join (O(n·m) per key — a non-equi nested loop at scale).
  * This implementation uses the union + running-last trick instead:
  * tag both sides, sort each key's rows by (ts, side), and carry the
  * last-seen right row forward with a running `last(..., ignoreNulls)`
  * window. ONE shuffle on the key, linear work per key, no join at
  * all — the shape that survives 100 TB (same approach Flink/KDB use
  * for time-series joins).
  *
  * Tie semantics: a right row at exactly left.ts matches (<=) — the
  * sort places side=0 (right) before side=1 (left) at equal ts.
  */
object AsOfJoin {

  /** @param left  rows to enrich; must carry `keyCol`, `tsCol`
    * @param right rows providing the as-of value
    * @param attrs right-side columns to carry onto matching left rows
    *              (emitted as `asof_<name>`, null when no right row
    *              precedes the left row). attrs.head must be unique
    *              per (key, ts) — it tiebreaks right rows sharing a
    *              timestamp (max attr wins), which keeps the match
    *              deterministic across runs and engines; without it a
    *              ROWS-ordered last() would pick by partition order.
    */
  def latestPriorMatch(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      attrs: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns
    val carried = struct((col(tsCol) +: attrs.map(col)).toIndexedSeq: _*)
    val l = left.withColumn("__side", lit(1)).withColumn("__carry", lit(null).cast(carriedType(right, tsCol, attrs)))
    val r = right
      .select((col(keyCol) +: col(tsCol) +: attrs.map(col)).toIndexedSeq: _*)
      .withColumn("__side", lit(0))
      .withColumn("__carry", carried)
    // align schemas for the union: left keeps its full row, right only
    // contributes (key, ts, side, carry)
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val unioned = l.unionByName(rAligned.select(l.columns.map(col).toIndexedSeq: _*))
    // left rows carry a null __carry; coalesce pins them below every
    // tied right row so the nulls-ordering quirk can't reorder ties
    val tieBreak = coalesce(col(s"__carry.${attrs.head}"), lit(Long.MinValue))
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = matched.select(
      (leftCols.map(col) :+
        col(s"__asof.$tsCol").as(s"asof_$tsCol")) ++
        attrs.map(a => col(s"__asof.$a").as(s"asof_$a")): _*
    )
    out
  }

  private def carriedType(right: DataFrame, tsCol: String, attrs: Seq[String]) = {
    val fields = right.select((col(tsCol) +: attrs.map(col)).toIndexedSeq: _*).schema
    org.apache.spark.sql.types.StructType(fields)
  }
}
