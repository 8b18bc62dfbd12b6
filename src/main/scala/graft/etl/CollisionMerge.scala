package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge rows that collide on a derived key.
  *
  * Reference: gerrydb_etl/bootstrap/pl_geo.py:149-190 — aiannh
  * reservation/trust parts share a geoid after marker stripping; the
  * reference iterates rows in a driver-side dict, summing ALAND/AWATER,
  * unioning geometry, tracking a collision_count and erroring if a key
  * collides more than twice.
  *
  * Spark-first: the row loop becomes ONE hash aggregate — sum the
  * measures, count the collisions, first() the carried attributes, and
  * classify the merged row. Map-side partial aggregation means the
  * shuffle carries one row per key per mapper, so this holds at 100 TB
  * (the reference's dict would not).
  */
object CollisionMerge {

  /** Group by `key`; sum `measures`; keep `min` of `carried`
    * (deterministic stand-in for the reference's "first seen", which
    * was driver-iteration-order dependent); `collision_count` = n-1
    * like the reference's counter. `classCol` (if present) becomes
    * "union" when rows merged, else its lone value (pl_geo.py:168).
    */
  def merge(
      df: DataFrame,
      key: String,
      measures: Seq[String],
      carried: Seq[String],
      classCol: Option[String] = None
  ): DataFrame = {
    val aggs =
      measures.map(m => sum(col(m)).as(m)) ++
        carried.map(c => min(col(c)).as(c)) ++
        classCol.toSeq.map(c =>
          when(count(lit(1)) > 1, lit("union")).otherwise(min(col(c))).as(c)
        ) :+
        (count(lit(1)) - 1).as("collision_count")
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Geometry union for collision merge, at the ENVELOPE level.
    *
    * Reference pl_geo.py:163-167 unions shapely geometries when parts
    * collide on a geoid. This container ships no polygon library
    * (SURVEY §2.B), so the union is computed on exact rectangle
    * envelopes instead: the merged row carries the bbox hull
    * (min/max of the parts' integer bounds), the summed part area,
    * the part count, and a representative INTERIOR point — the center
    * of the largest part, which is interior to the union because a
    * member part is contained in it (the same guarantee the
    * reference's `representative_point()` provides). All arithmetic
    * is integer-exact (centi-degree units), so the merge is
    * oracle-checkable bit-for-bit; a polygon-exact union slots in
    * here unchanged when a geo lib is available.
    *
    * Expects integer columns: `latLo/latHi/lonLo/lonHi` (envelope),
    * `area` (part area), and a unique `partId` for deterministic
    * largest-part tie-breaks. partId must stay below ~10^15 so the
    * oracle's arithmetic arg-max key (area·10^15 + partId) mirrors
    * the struct ordering exactly.
    */
  def mergeEnvelopes(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("n_parts"),
        (count(lit(1)) - 1).as("collision_count"),
        min(col("latLo")).as("u_lat_lo"),
        max(col("latHi")).as("u_lat_hi"),
        min(col("lonLo")).as("u_lon_lo"),
        max(col("lonHi")).as("u_lon_hi"),
        sum(col("area")).as("total_area"),
        // largest part's center, doubled units so it stays integer
        max_by(col("latLo") + col("latHi"), struct(col("area"), col("partId"))).as("rep_lat2"),
        max_by(col("lonLo") + col("lonHi"), struct(col("area"), col("partId"))).as("rep_lon2")
      )
}
