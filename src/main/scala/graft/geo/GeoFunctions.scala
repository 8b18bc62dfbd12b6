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
}
