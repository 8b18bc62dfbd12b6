package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** Config-driven column mapping — the reference's TabularConfig.
  *
  * Reference: gerrydb_etl/__init__.py:64-93 (ColumnConfig /
  * TabularConfig: source name, target name, aliases, kind, type) and
  * gerrydb_etl/bootstrap/pl_pop_tables.py:172-179 (lowercase rename +
  * per-config int cast). The reference renders these from Jinja YAML
  * templates; here a spec is plain data and "rendering" is string
  * substitution (see [[Templates]]).
  *
  * Spark-first: applying a spec is one `select` of cast/aliased
  * columns — Catalyst prunes unselected columns at the parquet scan.
  */
final case class ColumnSpec(
    source: String,
    target: String,
    castTo: Option[DataType] = None,
    aliases: Seq[String] = Nil,
    kind: String = "value",
    description: String = ""
)

final case class TableSpec(columns: Seq[ColumnSpec]) {

  /** Select exactly the configured columns, cast + renamed. Each spec
    * resolves to the FIRST of (source, aliases...) present in `df` —
    * the reference's cross-vintage alias handling, where the same
    * column ships as P1_001N / P001001 / P0010001 depending on Census
    * vintage (pl_pop_table_columns.py:90-116). Specs with no spelling
    * present are skipped (pl_geo.py:210-214).
    */
  def apply(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val projected = columns.flatMap { c =>
      (c.source +: c.aliases).find(present.contains).map { resolved =>
        val base = col(resolved)
        c.castTo.fold(base)(base.cast).as(c.target)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** alias → spec lookup across all alias spellings (pl_pop_tables.py:113-117). */
  def byAlias: Map[String, ColumnSpec] =
    columns.flatMap(c => (c.source +: c.aliases).map(_ -> c)).toMap
}
