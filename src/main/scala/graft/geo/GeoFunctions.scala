package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial-lite arithmetic as pure Column trees (codegen'd, no UDF).
  *
  * Reference: gerrydb_etl/bootstrap/pl_localities.py:81-92
  * (`identify_utm_zone`: UTM zone from a geometry centroid, modal zone
  * per locality) and gerrydb_etl/bootstrap/pl_geo.py:216 (internal
  * point construction). The container has no geometry lib, so geometry
  * reduces to (lat, lon) doubles — the zone/distance/bbox math is the
  * real reference semantics.
  *
  * Scale: everything here is a scalar expression evaluated inside
  * WholeStageCodegen; no shuffles, no UDF boxing.
  */
object GeoFunctions {

  /** Deterministic synthetic lon/lat derived from an integer key, so
    * geo operators have coordinates to chew on without a geometry
    * column. Integer mod then exact decimal scaling — bit-identical in
    * any engine.
    */
  def syntheticLon(key: Column): Column = (key * 7919L % 36000L) / 100.0 - 180.0
  def syntheticLat(key: Column): Column = (key * 104729L % 18000L) / 100.0 - 90.0

  /** UTM zone number from longitude (pl_localities.py:81-85):
    * zone = floor((lon + 180) / 6) + 1, clamped to [1, 60].
    */
  def utmZone(lon: Column): Column =
    least(floor((lon + 180.0) / 6.0) + 1, lit(60)).cast("int")

  /** Haversine great-circle distance in km between two (lat, lon)
    * pairs (degrees). 6371.0088 = IUGG mean earth radius.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a =
      pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2.0 * 6371.0088) * asin(sqrt(a))
  }

  /** Point-in-bbox containment (pl_geo.py:216 internal-point checks). */
  def inBbox(lat: Column, lon: Column, minLat: Double, maxLat: Double, minLon: Double, maxLon: Double): Column =
    lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon

  // --- Polygon rings (round 8): the executable slice of the reference's
  // real-geometry semantics (pl_geo.py:149-190 unions shapely polygons;
  // :216 constructs a representative point INSIDE the geometry). The
  // container has no geometry lib, so rings are plain
  // array<struct<x: bigint, y: bigint>> columns in integer
  // (centi-degree) coordinates — every operation below is EXACT integer
  // arithmetic, reproducible verbatim by any SQL engine. Vertices are
  // listed WITHOUT repeating the first point; the closing edge
  // (last -> first) is implicit.

  /** A ring vertex struct; build rings as array(ringPoint(x1,y1), ...). */
  def ringPoint(x: Column, y: Column): Column = struct(x.cast("long").as("x"), y.cast("long").as("y"))

  /** TWICE the signed shoelace area of a ring: Σ (xᵢ·yⱼ − xⱼ·yᵢ) over
    * consecutive vertex pairs (j = i+1 cyclically). Doubling keeps the
    * result an exact BIGINT (no halving division to round); sign > 0 ⇔
    * counter-clockwise winding. Degenerate rings (< 3 vertices)
    * correctly yield 0.
    */
  def shoelace2(ring: Column): Column = {
    val n = size(ring)
    // the degenerate branch guards the modulo and the descending
    // sequence(0, -1) an empty ring would otherwise evaluate (ANSI
    // divide-by-zero); CaseWhen only evaluates the taken branch
    when(n < 3, lit(0L)).otherwise(
      aggregate(
        sequence(lit(0), n - 1),
        lit(0L),
        (acc, i) => {
          val a = element_at(ring, i + 1)
          val b = element_at(ring, ((i + 1) % n) + 1)
          acc + (a.getField("x") * b.getField("y") - b.getField("x") * a.getField("y"))
        }
      )
    )
  }

  /** Ray-cast point-in-polygon over a ring, division-free: edge (i, j)
    * contributes a crossing when it straddles the horizontal ray at py
    * ((yᵢ > py) ≠ (yⱼ > py) — strict on both, so horizontal edges never
    * straddle) and the intersection lies right of px, tested in exact
    * integers by comparing (px−xᵢ)·dy against (xⱼ−xᵢ)·(py−yᵢ) with the
    * inequality flipped for dy < 0 (multiplying through by dy instead
    * of dividing — no FP, no engine drift). Odd crossing parity =
    * inside. Works for ANY simple polygon, convex or not. CONTRACT:
    * points exactly ON an edge get an arbitrary but deterministic
    * verdict (the usual crossing-number boundary behavior).
    */
  def pointInRing(px: Column, py: Column, ring: Column): Column = {
    val n = size(ring)
    val crossings = aggregate(
      sequence(lit(0), n - 1),
      lit(0L),
      (acc, i) => {
        val a = element_at(ring, i + 1)
        val b = element_at(ring, ((i + 1) % n) + 1)
        val xi = a.getField("x")
        val yi = a.getField("y")
        val xj = b.getField("x")
        val yj = b.getField("y")
        val straddles = (yi > py) =!= (yj > py)
        val dy = yj - yi
        val lhs = (px - xi) * dy
        val rhs = (xj - xi) * (py - yi)
        val crosses = straddles && when(dy > 0, lhs < rhs).otherwise(lhs > rhs)
        acc + when(crosses, 1L).otherwise(0L)
      }
    )
    // degenerate guard as in shoelace2: nothing is inside a <3-vertex ring
    when(n < 3, lit(false)).otherwise(crossings % 2 === 1)
  }
}
