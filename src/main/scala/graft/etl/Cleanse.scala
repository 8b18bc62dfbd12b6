package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** String cleansing + whole-row dedup.
  *
  * Reference: gerrydb_etl/bootstrap/pl_geo.py:103-116 — Census
  * geographies may contain '/' in geoids (breaks path semantics), and
  * some shapefiles ship fully duplicated rows; the reference applymaps
  * a replace over every string cell and then drop_duplicates().
  *
  * Spark-first: the per-cell lambda becomes a codegen'd
  * `regexp_replace`/`replace` Column per string field — no UDF, stays
  * inside WholeStageCodegen. Dedup is `dropDuplicates()`, a hash
  * aggregate over all columns (map-side partial agg, one shuffle).
  */
object Cleanse {

  /** Replace `from` with `to` in EVERY string column (literal match). */
  def replaceInStringColumns(df: DataFrame, from: String, to: String): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        // quote BOTH sides: the replacement string treats '$'/'\' as
        // group references, so a literal "$" or "c:\x" would corrupt
        // output or throw at runtime.
        regexp_replace(
          col(f.name),
          java.util.regex.Pattern.quote(from),
          java.util.regex.Matcher.quoteReplacement(to)
        ).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Whole-row exact dedup (pl_geo.py:114 drop_duplicates). */
  def dropExactDuplicates(df: DataFrame): DataFrame = df.dropDuplicates()
}
