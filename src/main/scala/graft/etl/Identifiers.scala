package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived identifier construction.
  *
  * Reference:
  *  - gerrydb_etl/__init__.py:59-61 `pathify` — lower, strip, spaces
  *    to '-', drop '.'.
  *  - gerrydb_etl/bootstrap/pl_pop_tables.py:161-170 — id = concat of
  *    id columns, auxiliary levels prefixed "level:", aiannh suffixed
  *    ":fips{fips}".
  *  - gerrydb_etl/bootstrap/pl_geo.py:144 — strip trailing r/t/R/T
  *    from aiannh geoids.
  *
  * All pure Column trees (codegen'd, null-safe), no UDFs.
  */
object Identifiers {

  /** lower(trim(s)) with ' '→'-' and '.' removed (pathify). */
  def pathify(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), " ", "-"), "\\.", "")

  /** Concatenate id parts into a single geoid-style key. */
  def compositeId(parts: Seq[Column]): Column = concat(parts: _*)

  /** "level:<id>" prefix for auxiliary levels; optional ":fips<f>" suffix. */
  def qualifiedId(id: Column, level: Column, fipsSuffix: Option[Column] = None): Column = {
    val base = concat(level, lit(":"), id)
    fipsSuffix.fold(base)(f => concat(base, lit(":fips"), f))
  }

  /** Strip trailing reservation/trust markers r/t/R/T (pl_geo.py:144). */
  def stripTrustMarker(c: Column): Column = regexp_replace(c, "[rtRT]+$", "")
}
