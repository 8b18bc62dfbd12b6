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
}
