package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-window range join: pair each probe row with the key-mates
  * whose timestamp falls in [probe.ts - windowLen, probe.ts).
  *
  * A raw inequality join is a per-key nested loop; bucketing both
  * sides to windowLen-sized time buckets turns it into an equi-join
  * with a fixed fan-out of 2 (each probe looks at its own bucket and
  * the previous one), then the exact range predicate filters inside
  * the bucket pairs — the standard interval-join decomposition every
  * streaming engine uses. Shuffle keys are (key, bucket); skew in a
  * hot bucket is AQE's skew-join case.
  */
object RangeJoin {

  /** Count (and aggregate) key-mates of `probes` within the trailing
    * window. Returns every probe row with `n_in_window` (0 when none).
    *
    * `idCol` must uniquely identify probe rows (never null): stats are
    * computed per probe ID — two probes sharing (key, ts) each get
    * exact counts — and joined back by the ID alone, so nullable
    * payload columns can't break the join and the 2×-exploded shuffle
    * carries only (id, key, ts), never the probe payload (same narrow-
    * shuffle rule as the dedup LSH paths).
    */
  def trailingWindowStats(
      events: DataFrame,
      probes: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      windowLen: Long,
      valueCol: String
  ): DataFrame = {
    // bucket key = window-aligned START (c - c mod W): pure 64-bit
    // integer arithmetic. floor(c / W) through a double corrupts ids
    // for values past 2^53 — raw nanosecond epochs qualify.
    val bucket = (c: Column) => c - pmod(c, lit(windowLen))
    val e = events.select(
      col(keyCol).as("__k"),
      col(tsCol).as("__ets"),
      col(valueCol).as("__ev"),
      bucket(col(tsCol)).as("__b")
    )
    // probe side explodes NARROW to its bucket start and the previous one
    val p = probes
      .select(col(idCol), col(keyCol), col(tsCol))
      .withColumn("__b", explode(array(bucket(col(tsCol)) - lit(windowLen), bucket(col(tsCol)))))
    val paired = p
      .join(e, col(keyCol) === col("__k") && p("__b") === e("__b"))
      .filter(col("__ets") >= col(tsCol) - lit(windowLen) && col("__ets") < col(tsCol))
    val stats = paired
      .groupBy(col(idCol).as("__sid"))
      .agg(count(lit(1)).as("n_in_window"), sum(col("__ev")).as("window_value"))
    probes
      .join(stats, col(idCol) === col("__sid"), "left")
      .select(
        probes.columns.toSeq.map(col) :+
          coalesce(col("n_in_window"), lit(0L)).as("n_in_window") :+
          coalesce(col("window_value"), lit(0L)).as("window_value"): _*
      )
  }
}
