package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (valid_from / valid_to) versioned tables.
  *
  * Reference: gerrydb_etl/db.py:123-147 — on re-import, currently-live
  * column values (valid_to IS NULL) for incoming (col_id, geo_id)
  * pairs are closed out (valid_to = now) and fresh rows inserted with
  * valid_from = now. gerrydb_etl/bootstrap/pl_geo.py:294-316 does the
  * same deprecate+insert dance for GeoSetVersions.
  *
  * Spark-first: the reference's SELECT-stale-pairs + UPDATE + INSERT
  * becomes a semi-join-driven column rewrite + union — pure set
  * operations, one shuffle on the key, no per-row round-trips. At
  * 100 TB the history table should be partitioned by a key bucket so
  * the join co-locates.
  */
object Versioned {

  /** Apply a batch of `incoming` rows (same schema minus validity cols)
    * at logical time `now`: live rows matching an incoming key get
    * valid_to = now; incoming rows get valid_from = now,
    * valid_to = null.
    */
  def upsert(history: DataFrame, incoming: DataFrame, keys: Seq[String], now: Column): DataFrame = {
    val keyCols = keys.map(col)
    val incomingKeys = incoming.select(keyCols: _*).distinct()
    val matchesIncoming = keys.map(k => col(k) === col(s"__in_$k")).reduce(_ && _)
    val renamedKeys = incomingKeys.toDF(keys.map(k => s"__in_$k"): _*)

    // Close out live rows for incoming keys. A left join + flag avoids
    // splitting history into two scans (the naive semi/anti pair).
    // No broadcast hint: an explicit hint FORCES a broadcast regardless
    // of size, and a full re-import batch (plausible at 100 TB) would
    // OOM the driver; the key set is aggregated (distinct), so AQE's
    // runtime stats pick broadcast whenever it actually is small.
    val closed = history
      .join(renamedKeys, matchesIncoming, "left")
      .withColumn(
        "valid_to",
        when(col(s"__in_${keys.head}").isNotNull && col("valid_to").isNull, now)
          .otherwise(col("valid_to"))
      )
      .drop(keys.map(k => s"__in_$k"): _*)

    val fresh = incoming
      .withColumn("valid_from", now)
      .withColumn("valid_to", lit(null).cast("timestamp"))

    closed.unionByName(fresh.select(closed.columns.map(col).toIndexedSeq: _*))
  }

  /** Rows live as of `at` (half-open interval [valid_from, valid_to)). */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at && (col("valid_to").isNull || col("valid_to") > at))

  /** Latest version per key by `orderCol` (row_number window). */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
