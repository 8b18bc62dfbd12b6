package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-vintage reconciliation: prefer current rows, resurrect
  * legacy-only rows.
  *
  * Reference: gerrydb_etl/bootstrap/pl_localities.py:146-157 — legacy
  * counties = 2010 GEOIDs minus 2020 GEOIDs (set difference), then
  * concat back onto the 2020 frame.
  *
  * Spark-first: the python set-difference is a LEFT ANTI join (one
  * shuffle on the key, or a broadcast when the current key set is
  * small) followed by unionByName — no driver-side sets, so a
  * 100 TB vintage reconciliation streams.
  */
object Reconcile {

  /** Rows of `legacy` whose `key` is absent from `current`. */
  def legacyOnly(current: DataFrame, legacy: DataFrame, key: String): DataFrame =
    legacy.join(current.select(key), Seq(key), "left_anti")

  /** `current` ∪ legacy-only rows, tagged with a `vintage` column. */
  def crossVintageUnion(
      current: DataFrame,
      legacy: DataFrame,
      key: String,
      currentTag: String,
      legacyTag: String
  ): DataFrame =
    current
      .withColumn("vintage", lit(currentTag))
      .unionByName(legacyOnly(current, legacy, key).withColumn("vintage", lit(legacyTag)))
}
