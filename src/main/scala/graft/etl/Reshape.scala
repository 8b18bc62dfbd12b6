package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long reshaping.
  *
  * Reference: gerrydb_etl/db.py:71-147 `load_column_values` turns a
  * wide DataFrame (one column per measure, indexed by geography) into
  * long (col_id, geo_id, value) rows — an unpivot. The inverse (pivot)
  * reconstructs the wide view a client sees.
  *
  * Spark-first: melt is a `stack`-style explode of (name, value)
  * struct pairs — narrow (no shuffle), linear scan, codegen'd. Pivot
  * uses Spark's groupBy().pivot(values) with values supplied
  * explicitly so the planner skips the extra distinct-values job —
  * essential at 100 TB where an implicit pivot would scan twice.
  */
object Reshape {

  /** Unpivot `valueCols` into (`nameCol`, `valueCol`) long rows, keeping `idCols`. */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      nameCol: String = "col_name",
      valueCol: String = "value"
  ): DataFrame = {
    val pairs = array(valueCols.map(c => struct(lit(c).as("n"), col(c).cast("double").as("v"))): _*)
    df.select(idCols.map(col) :+ explode(pairs).as("nv"): _*)
      .select(idCols.map(col) :+ col("nv.n").as(nameCol) :+ col("nv.v").as(valueCol): _*)
  }

  /** Pivot long rows back to wide; `names` passed explicitly (no discovery scan). */
  def pivot(
      df: DataFrame,
      idCols: Seq[String],
      nameCol: String,
      valueCol: String,
      names: Seq[String]
  ): DataFrame =
    df.groupBy(idCols.map(col): _*)
      .pivot(nameCol, names)
      .agg(sum(col(valueCol)))
}
