package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Programmatic Census PL 94-171 column-name aliasing and longform
  * label parsing, as pure Column trees.
  *
  * The reference derives the three equivalent column-name formats from
  * whichever one it is handed (pl_pop_table_columns.py:90-117
  * `column_aliases`: 2020's `P1_001N`, 2010's `P001001`, and the
  * `P0010001` variant that crops up in some usages) and parses the
  * API's longform `!!`-separated labels into canonical short names
  * (`:66-88` `parse_labels`: keep int-typed or "Total" variables, take
  * the last `!!` segment, strip "alone", correct the 2010 P004059
  * comma-for-semicolon bug, map each "; "-separated race part through
  * COL_LABELS, and flag Hispanic/Not-Hispanic lineage). Here both are
  * scan-side expressions — a variables frame of any size flows through
  * with no shuffle, and the same arithmetic runs in the DuckDB oracle.
  */
object CensusAliases {

  /** Longform race/label part → canonical short name
    * (pl_pop_table_columns.py:15-31 COL_LABELS). Parts not in the map
    * pass through unchanged, as in the reference's `.get(part, part)`.
    */
  val ColLabels: Seq[(String, String)] = Seq(
    "Asian" -> "asian",
    "White" -> "white",
    "Black" -> "black",
    "Some Other Race" -> "other",
    "Black or African American" -> "black",
    "Native Hawaiian and Other Pacific Islander" -> "nhpi",
    "American Indian and Alaska Native" -> "amin",
    "Total" -> "total",
    "Population of one race" -> "one_race",
    "Population of two or more races" -> "two_or_more_races",
    "Population of two races" -> "two_races",
    "Population of three races" -> "three_races",
    "Population of four races" -> "four_races",
    "Population of five races" -> "five_races",
    "Population of six races" -> "six_races"
  )

  /** Columns shared between tables, imported once under the canonical
    * name (pl_pop_table_columns.py:54-61) — note the map carries only
    * the 2020 and 7-char-2010 spellings, exactly as the reference.
    */
  val RedundantToCanonical: Seq[(String, String)] = Seq(
    "P2_001N" -> "P1_001N",
    "P002001" -> "P001001",
    "P4_001N" -> "P3_001N",
    "P004001" -> "P003001"
  )

  private val Fmt2020 = "^P[0-9]_[0-9]{3}N$"
  private val Fmt2010Six = "^P00[0-9]{4}$"
  private val Fmt2010Seven = "^P00[0-9]0[0-9]{3}$"

  /** (table_id, col_id) extracted from whichever of the three formats
    * `name` is in — (null, null) when unrecognized, mirroring the
    * reference's `return None`.
    */
  private def tableAndCol(name: Column): (Column, Column) = {
    val t = when(name.rlike(Fmt2020), substring(name, 2, 1))
      .when(name.rlike(Fmt2010Six), substring(name, 4, 1))
      .when(name.rlike(Fmt2010Seven), substring(name, 4, 1))
    val c = when(name.rlike(Fmt2020), substring(name, 4, 3))
      .when(name.rlike(Fmt2010Six), substring(name, 5, 3))
      .when(name.rlike(Fmt2010Seven), substring(name, 6, 3))
    (t, c)
  }

  /** The 2020-format alias (`Px_yyyN`), null if `name` unrecognized. */
  def alias2020(name: Column): Column = {
    val (t, c) = tableAndCol(name)
    concat(lit("P"), t, lit("_"), c, lit("N"))
  }

  /** The 2010 6-digit alias (`P00xyyy`). */
  def alias2010Six(name: Column): Column = {
    val (t, c) = tableAndCol(name)
    concat(lit("P00"), t, c)
  }

  /** The 2010 7-digit alias (`P00x0yyy`). */
  def alias2010Seven(name: Column): Column = {
    val (t, c) = tableAndCol(name)
    concat(lit("P00"), t, lit("0"), c)
  }

  /** Canonical name: redundant cross-table duplicates collapse to the
    * table they are imported under; everything else is itself.
    */
  def canonicalName(name: Column): Column =
    RedundantToCanonical.foldLeft(name)((acc, kv) => when(name === kv._1, lit(kv._2)).otherwise(acc))

  /** Keep-filter: int-typed variables plus the bare "Total" row
    * (parse_labels' `label == "Total" or predicateType == "int"`).
    */
  def keepVariable(label: Column, predicateType: Column): Column =
    label === "Total" || predicateType === "int"

  /** The cleaned last label segment: drop ':', take the last '!!'
    * part, strip "alone", apply the 2010 P004059 comma-bug fix.
    *
    * The alone-strip is DELIBERATELY the reference's exact substring
    * semantics (pl_pop_table_columns.py:74 `label.replace("alone",
    * "").strip()`), including its limitation: a segment where "alone"
    * is not the final token (e.g. ACS "alone or in combination"
    * phrasing, which does not occur in the PL 94-171 P1–P4 labels this
    * targets) would keep interior double spaces. Fidelity over repair:
    * diverging here would silently produce different short names than
    * the reference for the same input.
    */
  def cleanLabel(label: Column): Column = {
    val last = element_at(split(regexp_replace(label, ":", ""), "!!"), -1)
    val noAlone = trim(regexp_replace(last, "alone", ""))
    regexp_replace(noAlone, ", Some Other Race", "; Some Other Race")
  }

  /** Canonical short name: each "; "-separated part mapped through
    * [[ColLabels]] (identity for unknown parts), joined with '_'.
    */
  def shortName(label: Column): Column = {
    def mapPart(p: Column): Column =
      ColLabels.foldLeft(p)((acc, kv) => when(p === kv._1, lit(kv._2)).otherwise(acc))
    array_join(transform(split(cleanLabel(label), "; "), p => mapPart(p)), "_")
  }

  /** Hispanic lineage flag as nullable 1/0: labels outside the
    * Hispanic tables carry no flag (the reference's `None`).
    */
  def hispanicFlag(label: Column): Column =
    when(
      label.contains("Hispanic or Latino"),
      when(label.contains("Not Hispanic or Latino"), lit(0)).otherwise(lit(1))
    )
}
