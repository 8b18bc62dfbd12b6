package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.geo.GeoFunctions._
import graft.sources.Tables

/** Round-2 wave 3 (q52-q54): vintage diff (CDC), SCD2 interval audit,
  * and a grid-bucketed spatial join — the audit/maintenance operators
  * around a versioned store (reference: the reconcile/versioning
  * machinery of pl_localities.py + db.py, generalized).
  */
object AuditQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q52: grid-bucketed spatial nearest-join. A naive nearest-neighbor
    // assignment is a cross join; bucketing points to a coarse
    // lat/lon grid and exploding each centroid to its grid cell +
    // 8 neighbors turns it into an equi-join with bounded fan-out,
    // then exact haversine refines within candidates. The classic
    // distributed spatial-join decomposition. NOTE: the inner join
    // means points outside every centroid's 3x3 block get NO
    // assignment (dropped) — callers wanting total coverage must
    // widen the cell size or union an exact pass over the remainder
    // (q24 is that exact pass).
    "q52_spatial_grid_join" -> { (s, dir) =>
      import s.implicits._
      val cellDeg = 10.0
      val pts = Tables
        .customer(s, dir)
        .select(
          col("c_custkey"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon")
        )
        .withColumn("cx", floor(col("lon") / cellDeg).cast("long"))
        .withColumn("cy", floor(col("lat") / cellDeg).cast("long"))
      val cents = GeoTextQueries.Centroids.toDF("cent_id", "cent_lat", "cent_lon")
      // centroid side explodes to its cell + 8 neighbors (3x3 block)
      val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
      val centCells = cents
        .withColumn("cx0", floor(col("cent_lon") / cellDeg).cast("long"))
        .withColumn("cy0", floor(col("cent_lat") / cellDeg).cast("long"))
        .withColumn("off", explode(array(offsets.map { case (dx, dy) => struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)))
        .select(
          col("cent_id"),
          col("cent_lat"),
          col("cent_lon"),
          (col("cx0") + col("off.dx")).as("cx"),
          (col("cy0") + col("off.dy")).as("cy")
        )
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("dist_km").asc, col("cent_id").asc)
      pts
        .join(broadcast(centCells), Seq("cx", "cy"))
        .withColumn("dist_km", haversineKm(col("lat"), col("lon"), col("cent_lat"), col("cent_lon")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("cent_id").as("grid_nearest"), round(col("dist_km"), 2).as("dist_km"))
    },

    // q53: SCD2 interval-overlap audit — for each key, flag version
    // rows whose validity interval overlaps the NEXT version's (a
    // corrupt history: two versions live at once). Window lead, one
    // key shuffle, no self-join. History synthesized as in q13:
    // orders = two versions per key via o_orderdate vs a shifted date.
    "q53_interval_audit" -> { (s, dir) =>
      // versions: each order contributes v1 [date, date+30d) and
      // v2 [date+20d, null) — v1 deliberately overlaps v2 by 10 days
      // for ~1/3 of keys (o_orderkey % 3 = 0), else v1 ends exactly
      // when v2 starts.
      val base = Tables
        .orders(s, dir)
        // o_orderdate is TIMESTAMP_NTZ; cast under the UTC session so
        // unix_millis matches DuckDB's wall-clock epoch_ms exactly
        .select(col("o_orderkey"), expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000").as("d0"))
      val v1 = base.select(
        col("o_orderkey"),
        lit(1L).as("version"),
        col("d0").as("valid_from"),
        when(col("o_orderkey") % 3 === 0, col("d0") + 30).otherwise(col("d0") + 20).as("valid_to")
      )
      val v2 = base.select(
        col("o_orderkey"),
        lit(2L).as("version"),
        (col("d0") + 20).as("valid_from"),
        lit(null).cast("long").as("valid_to")
      )
      val hist = v1.unionByName(v2)
      val w = Window.partitionBy(col("o_orderkey")).orderBy(col("valid_from").asc, col("version").asc)
      hist
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .withColumn(
          "overlaps_next",
          when(col("next_from").isNotNull && col("valid_to").isNotNull && col("valid_to") > col("next_from"), 1L)
            .otherwise(0L)
        )
        .groupBy(col("o_orderkey"))
        .agg(
          count(lit(1)).as("n_versions"),
          sum(col("overlaps_next")).as("n_overlaps")
        )
        .filter(col("n_overlaps") > 0)
    },

    // q56: the capstone corpus-cleaning pipeline — the C4/Gopher-style
    // filter chain a training-data run executes end-to-end: exact-dedup
    // canonicalization (keep each text's min doc_id), language gate,
    // quality floor, length band. Composes q26-q30's building blocks
    // into ONE plan: a scalar filter chain + one md5 aggregate + one
    // semi join — Catalyst fuses the scalars into the scan projection.
    "q56_clean_corpus" -> { (s, dir) =>
      import graft.text.TextFunctions._
      val docs = Tables.documents(s, dir)
      val keepIds = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      docs
        .join(keepIds, Seq("doc_id"), "left_semi")
        .select(
          col("doc_id"),
          col("lang"),
          langId(col("text")).as("pred_lang"),
          qualityScore(col("text"), col("n_chars")).as("quality"),
          col("n_chars")
        )
        .filter(col("pred_lang") === "en" && col("quality") >= 0.5 && col("n_chars").between(100, 2000))
    },

    // q54: CDC vintage diff — classify every key across two dataset
    // vintages as added / removed / changed / unchanged with counts
    // (the reconcile generalization of pl_localities.py:147-157).
    // Vintages synthesized from customer: v2020 = all, v2010 = keys
    // with c_custkey % 10 != 0 and a shifted balance for % 7 == 0.
    "q54_cdc_diff" -> { (s, dir) =>
      val cur = Tables
        .customer(s, dir)
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
      val prev = cur
        .filter(col("c_custkey") % 10 =!= 0)
        .withColumn("bal", when(col("c_custkey") % 7 === 0, round(col("bal") + 100.0, 2)).otherwise(col("bal")))
      cur
        .withColumnRenamed("bal", "bal_new")
        .join(prev.withColumnRenamed("bal", "bal_old"), Seq("c_custkey"), "full_outer")
        .withColumn(
          "status",
          when(col("bal_old").isNull, "added")
            .when(col("bal_new").isNull, "removed")
            .when(col("bal_new") =!= col("bal_old"), "changed")
            .otherwise("unchanged")
        )
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"))
    }
  )

  private def synLatSql(k: String) = s"(($k * 104729) % 18000) / 100.0 - 90.0"
  private def synLonSql(k: String) = s"(($k * 7919) % 36000) / 100.0 - 180.0"
  private def havSql(lat1: String, lon1: String, lat2: String, lon2: String) =
    s"""2.0 * 6371.0088 * asin(sqrt(
       |  pow(sin(radians($lat2 - $lat1) / 2.0), 2) +
       |  cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2.0), 2)))""".stripMargin

  private def hitsSql(words: Seq[String]) =
    s"len(regexp_extract_all(text, '\\b(${words.mkString("|")})\\b'))"

  def oracle: Map[String, String] = Map(
    "q56_clean_corpus" ->
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d AS (SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)),
         |feat AS (SELECT doc_id, lang, n_chars,
         |                len(string_split_regex(trim(text), '${graft.text.TextFunctions.WsRun}')) toks,
         |                ${hitsSql(Seq("the", "a", "and", "of", "to", "in", "is"))} stop_hits,
         |                len(regexp_extract_all(text, '[.,!?;:]')) punct_hits,
         |                ${hitsSql(Seq("the", "and", "of", "is"))} en_hits,
         |                ${hitsSql(Seq("el", "la", "de", "que"))} es_hits,
         |                ${hitsSql(Seq("le", "les", "et", "une"))} fr_hits,
         |                ${hitsSql(Seq("der", "die", "und", "das"))} de_hits
         |         FROM d),
         |scored AS (
         |  SELECT doc_id, lang,
         |         CASE WHEN en_hits > 0 AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |              WHEN es_hits > 0 AND es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |              WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
         |              WHEN de_hits > 0 THEN 'de' ELSE 'und' END AS pred_lang,
         |         CAST((25 * least(n_chars, 400) + 4000) * toks
         |              + 6000 * stop_hits - 4000 * punct_hits AS DOUBLE)
         |           / (CAST(20000 AS DOUBLE) * toks) AS quality,
         |         n_chars
         |  FROM feat)
         |SELECT doc_id, lang, pred_lang, quality, n_chars FROM scored
         |WHERE pred_lang = 'en' AND quality >= 0.5 AND n_chars BETWEEN 100 AND 2000""".stripMargin,
    "q52_spatial_grid_join" ->
      s"""WITH pts AS (SELECT c_custkey,
         |                    ${synLatSql("c_custkey")} AS lat,
         |                    ${synLonSql("c_custkey")} AS lon
         |             FROM customer),
         |p2 AS (SELECT c_custkey, lat, lon,
         |              CAST(floor(lon / 10.0) AS BIGINT) cx,
         |              CAST(floor(lat / 10.0) AS BIGINT) cy
         |       FROM pts),
         |cents AS (SELECT * FROM (VALUES (0, 40.7, -74.0), (1, 51.5, -0.1), (2, 35.7, 139.7),
         |                                (3, -33.9, 151.2), (4, -23.5, -46.6)) c(cent_id, cent_lat, cent_lon)),
         |cc AS (SELECT cent_id, cent_lat, cent_lon,
         |              CAST(floor(cent_lon / 10.0) AS BIGINT) + dx AS cx,
         |              CAST(floor(cent_lat / 10.0) AS BIGINT) + dy AS cy
         |       FROM cents, (VALUES (-1),(0),(1)) xs(dx), (VALUES (-1),(0),(1)) ys(dy)),
         |cand AS (SELECT c_custkey, cent_id,
         |                ${havSql("lat", "lon", "cent_lat", "cent_lon")} AS d
         |         FROM p2 JOIN cc USING (cx, cy))
         |SELECT c_custkey, grid_nearest, dist_km FROM (
         |  SELECT c_custkey, cent_id AS grid_nearest, round(d, 2) AS dist_km,
         |         row_number() OVER (PARTITION BY c_custkey ORDER BY d ASC, cent_id ASC) rn
         |  FROM cand) WHERE rn = 1""".stripMargin,
    "q53_interval_audit" ->
      """WITH base AS (SELECT o_orderkey, epoch_ms(o_orderdate) // 86400000 AS d0 FROM orders),
        |hist AS (
        |  SELECT o_orderkey, 1 AS version, d0 AS valid_from,
        |         CASE WHEN o_orderkey % 3 = 0 THEN d0 + 30 ELSE d0 + 20 END AS valid_to
        |  FROM base
        |  UNION ALL
        |  SELECT o_orderkey, 2, d0 + 20, NULL FROM base),
        |flagged AS (
        |  SELECT o_orderkey, valid_to,
        |         lead(valid_from) OVER (PARTITION BY o_orderkey
        |                                ORDER BY valid_from ASC, version ASC) AS next_from
        |  FROM hist)
        |SELECT o_orderkey, count(*) AS n_versions,
        |       CAST(sum(CASE WHEN next_from IS NOT NULL AND valid_to IS NOT NULL
        |                      AND valid_to > next_from THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps
        |FROM flagged
        |GROUP BY o_orderkey
        |HAVING sum(CASE WHEN next_from IS NOT NULL AND valid_to IS NOT NULL
        |                 AND valid_to > next_from THEN 1 ELSE 0 END) > 0""".stripMargin,
    "q54_cdc_diff" ->
      """WITH cur AS (SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer),
        |prev AS (SELECT c_custkey,
        |                CASE WHEN c_custkey % 7 = 0 THEN round(bal + 100.0, 2) ELSE bal END AS bal
        |         FROM cur WHERE c_custkey % 10 != 0)
        |SELECT status, count(*) AS n FROM (
        |  SELECT CASE WHEN p.c_custkey IS NULL THEN 'added'
        |              WHEN c.c_custkey IS NULL THEN 'removed'
        |              WHEN c.bal != p.bal THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM cur c FULL OUTER JOIN prev p ON c.c_custkey = p.c_custkey)
        |GROUP BY status""".stripMargin
  )
}
