package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.CollisionMerge
import graft.geo.Dissolve
import graft.geo.GeoFunctions._
import graft.text.TextFunctions._
import graft.sources.Tables

/** §2.B geospatial-lite (q23-q25) + §2.C text analysis (q26-q29).
  *
  * Geo coordinates are derived deterministically from integer keys
  * (exact integer mod + decimal scaling — bit-identical in Spark and
  * DuckDB), standing in for the reference's shapefile centroids.
  *
  * Scale notes: every operator here is a narrow scalar pipeline into
  * one aggregate/window — a single shuffle, codegen throughout. The
  * centroid table in q24 is a 5-row literal → broadcast nested-loop
  * is trivially right; never a shuffle.
  */
object GeoTextQueries {

  /** Fixed "region centroid" seed points for nearest-assignment. */
  val Centroids: Seq[(Int, Double, Double)] = Seq(
    (0, 40.7, -74.0),
    (1, 51.5, -0.1),
    (2, 35.7, 139.7),
    (3, -33.9, 151.2),
    (4, -23.5, -46.6)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q23: UTM zone per point + modal zone per nation
    // (pl_localities.py:81-92 identify_utm_zone = modal centroid zone).
    "q23_utm_zone" -> { (s, dir) =>
      val pts = Tables
        .customer(s, dir)
        .select(
          col("c_nationkey"),
          utmZone(syntheticLon(col("c_custkey"))).as("zone")
        )
      val counts = pts.groupBy(col("c_nationkey"), col("zone")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("n").desc, col("zone").asc)
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("zone").as("modal_zone"), col("n"))
    },

    // q24: haversine nearest-centroid assignment. 5-row literal dim ×
    // customer points; row_number picks the min-distance centroid with
    // a deterministic id tiebreak.
    "q24_haversine" -> { (s, dir) =>
      import s.implicits._
      val cents = Centroids.toDF("cent_id", "cent_lat", "cent_lon")
      val pts = Tables
        .customer(s, dir)
        .select(
          col("c_custkey"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon")
        )
      val dists = pts
        .crossJoin(broadcast(cents))
        .withColumn("dist_km", haversineKm(col("lat"), col("lon"), col("cent_lat"), col("cent_lon")))
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("dist_km").asc, col("cent_id").asc)
      dists
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("cent_id").as("nearest_centroid"), round(col("dist_km"), 2).as("dist_km"))
    },

    // q25: per-nation bbox + internal point (pl_geo.py:216) + count of
    // points inside a fixed query bbox. The internal point is computed
    // from EXACT integer centilat/centilon sums (one double division at
    // the end) — a plain avg(double) is summation-order-dependent, so
    // Spark's parallel partial agg and a sequential engine could round
    // the 4th decimal differently.
    "q25_point_bbox" -> { (s, dir) =>
      Tables
        .customer(s, dir)
        .select(
          col("c_nationkey"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon"),
          ((col("c_custkey") * 104729) % 18000).as("lat_m"),
          ((col("c_custkey") * 7919) % 36000).as("lon_m")
        )
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n_points"),
          sum(when(inBbox(col("lat"), col("lon"), 0.0, 60.0, -30.0, 60.0), 1L).otherwise(0L)).as("n_in_bbox"),
          min(col("lat")).as("min_lat"),
          max(col("lat")).as("max_lat"),
          min(col("lon")).as("min_lon"),
          max(col("lon")).as("max_lon"),
          round(sum(col("lat_m")).cast("double") / count(lit(1)) / lit(100.0) - lit(90.0), 4).as("internal_lat"),
          round(sum(col("lon_m")).cast("double") / count(lit(1)) / lit(100.0) - lit(180.0), 4).as("internal_lon")
        )
    },

    // q26: token counting — whitespace tokens + regex token runs.
    "q26_token_count" -> { (s, dir) =>
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          tokenCountWs(col("text")).as("ws_tokens"),
          tokenCountRe(col("text")).as("re_tokens")
        )
    },

    // q27: composite quality score (length/stopword/punct heuristics).
    "q27_quality_score" -> { (s, dir) =>
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          tokenCountWs(col("text")).as("n_tokens"),
          stopwordHits(col("text")).as("stop_hits"),
          punctHits(col("text")).as("punct_hits"),
          qualityScore(col("text"), col("n_chars")).as("quality")
        )
    },

    // q28: stopword-heuristic language ID with per-language scores.
    "q28_langid" -> { (s, dir) =>
      val hitCols = LangStopwords.map { case (lang, words) =>
        stopwordHits(col("text"), words).as(s"${lang}_hits")
      }
      Tables
        .documents(s, dir)
        .select(col("doc_id") +: langId(col("text")).as("pred_lang") +: hitCols: _*)
        .select("doc_id", "pred_lang", "en_hits", "es_hits", "fr_hits", "de_hits")
    },

    // q29: Karp-Rabin rolling-hash fingerprint of the 64-char prefix +
    // duplicate-prefix group size via a self-agg join.
    "q29_fingerprint" -> { (s, dir) =>
      Tables
        .documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), fingerprint("text").as("fp"))
    },

    // q103: polygon statistics — shoelace area + ray-cast
    // point-in-polygon as pure Column trees over
    // array<struct<x,y>> rings (round 8; closes more of the
    // pl_geo.py:149-190/:216 real-geometry gap without a geo lib).
    // Every customer key synthesizes a deterministic integer pentagon:
    // keys ≡ 0 (mod 3) get a CONCAVE top notch (the bbox center falls
    // OUTSIDE — exactly the case where the reference needs a true
    // interior point, pl_geo.py:216), others a convex-ish roof spike
    // (center inside). area2 = exact-integer twice-signed-area;
    // center_in = division-free integer ray cast. The oracle unrolls
    // the same arithmetic over the 5 vertices as scalar SQL —
    // bit-identical BIGINT ops, no FP anywhere.
    "q103_polygon_stats" -> { (s, dir) =>
      import graft.geo.GeoFunctions
      val ring = col("ring")
      Tables
        .customer(s, dir)
        .select(
          col("c_custkey"),
          (col("c_custkey") * 7919 % 30000).as("x0"),
          (col("c_custkey") * 104729 % 15000).as("y0"),
          (col("c_custkey") % 80 + 20).as("w"),
          (col("c_custkey") % 60 + 20).as("h")
        )
        .select(
          col("c_custkey"),
          col("x0"),
          col("y0"),
          col("w"),
          col("h"),
          expr("x0 + w DIV 2").as("cx"),
          expr("CASE WHEN c_custkey % 3 = 0 THEN y0 + h DIV 4 ELSE y0 + 2 * h END").as("apex_y"),
          expr("CASE WHEN c_custkey % 3 = 0 THEN y0 + h DIV 2 ELSE y0 + h END").as("cy")
        )
        .select(
          col("c_custkey"),
          col("cx"),
          col("cy"),
          array(
            GeoFunctions.ringPoint(col("x0"), col("y0")),
            GeoFunctions.ringPoint(col("x0") + col("w"), col("y0")),
            GeoFunctions.ringPoint(col("x0") + col("w"), col("y0") + col("h")),
            GeoFunctions.ringPoint(col("cx"), col("apex_y")),
            GeoFunctions.ringPoint(col("x0"), col("y0") + col("h"))
          ).as("ring")
        )
        .select(
          col("c_custkey"),
          size(ring).cast("long").as("n_vertices"),
          GeoFunctions.shoelace2(ring).as("area2"),
          (GeoFunctions.shoelace2(ring) > 0).as("is_ccw"),
          GeoFunctions.pointInRing(col("cx"), col("cy"), ring).as("center_in")
        )
    },

    // q88: geometry union on collision (pl_geo.py:149-190's missing
    // half — q10 merges the measures; this merges the GEOMETRY, at the
    // envelope level since the container has no polygon lib): parts
    // are exact integer centi-degree rectangles derived from keys;
    // colliding parts union to the bbox hull + summed area + the
    // largest part's center as a guaranteed-interior representative
    // point. ONE hash aggregate (see CollisionMerge.mergeEnvelopes).
    "q88_geo_union_merge" -> { (s, dir) =>
      val ck = col("c_custkey")
      CollisionMerge.mergeEnvelopes(
        Tables
          .customer(s, dir)
          .select(
            (ck % 97).as("geoid"),
            ((ck * 104729) % 17000 - 8500).as("latLo"),
            ((ck * 104729) % 17000 - 8500 + (ck % 50 + 1)).as("latHi"),
            ((ck * 7919) % 35000 - 17500).as("lonLo"),
            ((ck * 7919) % 35000 - 17500 + (ck % 70 + 1)).as("lonHi"),
            ((ck % 50 + 1) * (ck % 70 + 1)).as("area"),
            ck.as("partId")
          ),
        "geoid"
      )
    },

    // q124: polygon dissolve on collision — the TRUE-union half of
    // pl_geo.py:169-171 (shapely.unary_union inside the collision
    // merge) that q88 approximates at envelope level. Each customer
    // key contributes one 10×10 grid cell (a CCW integer square ring)
    // to its geoid; a geoid's cells dissolve into their exact union
    // via boundary edge cancellation (geo/Dissolve.scala): interior
    // edges pair up and their shoelace cross terms cancel, so union
    // area2 and the union boundary both fall out of ONE (geoid, edge)
    // count/sum aggregate + ONE per-geoid aggregate — no geometry
    // predicates, no joins. n_parts needs no extra pass either: every
    // square contributes 4 edge incidences, so 4·n_parts =
    // n_boundary + 2·n_interior. All-BIGINT exact; the oracle
    // reproduces the same edges and cancellation in DuckDB.
    "q124_polygon_dissolve" -> { (s, dir) =>
      val k = col("c_custkey")
      val cells = Tables
        .customer(s, dir)
        .select((k % 97).as("geoid"), ((k * 7919) % 12).as("gx"), ((k * 104729) % 8).as("gy"))
        // distinct cells: the planar-partition contract (two keys may
        // land on the same cell; a duplicated part is an overlap)
        .dropDuplicates("geoid", "gx", "gy")
        .select(
          col("geoid"),
          array(
            ringPoint(col("gx") * 10, col("gy") * 10),
            ringPoint(col("gx") * 10 + 10, col("gy") * 10),
            ringPoint(col("gx") * 10 + 10, col("gy") * 10 + 10),
            ringPoint(col("gx") * 10, col("gy") * 10 + 10)
          ).as("ring")
        )
      Dissolve
        .dissolve(cells, "geoid", "ring")
        .withColumn("n_parts", expr("(n_boundary_edges + 2 * n_interior_edges) DIV 4"))
        .select(
          col("geoid"),
          col("n_parts"),
          col("area2"),
          col("n_boundary_edges"),
          col("n_interior_edges"),
          col("perimeter"),
          col("bb_x_lo"),
          col("bb_y_lo"),
          col("bb_x_hi"),
          col("bb_y_hi")
        )
    },

    // q139: dissolve under the WIDENED vertex-snapping contract
    // (Dissolve.scaladoc): the input deliberately mixes part sizes —
    // a bottom row of 20×10 rectangles and a top row of 10×10
    // squares — so a square's bottom edge abuts only HALF of a
    // rectangle's top edge (a T-junction at the rectangle midpoint,
    // exactly the case q124's exact-vertex contract declares out of
    // scope). snapVertices inserts each group vertex into collinear
    // edges before cancellation; the split halves then cancel with
    // the squares above while unsupported halves stay boundary. The
    // oracle replays the identical snap (edge × group-vertex
    // collinearity join, lead() chain walk) in SQL. n_parts is an
    // honest per-geoid part count (the q124 incidence formula assumes
    // uniform 4-edge parts, which splitting breaks) — a 97-row agg,
    // broadcast back.
    "q139_dissolve_snap" -> { (s, dir) =>
      val k = col("c_custkey")
      val cust = Tables.customer(s, dir)
      val rects = cust
        .select((k % 97).as("geoid"), ((k * 7919) % 6).as("j"))
        .dropDuplicates("geoid", "j")
        .select(
          col("geoid"),
          array(
            ringPoint(col("j") * 20, lit(0L)),
            ringPoint(col("j") * 20 + 20, lit(0L)),
            ringPoint(col("j") * 20 + 20, lit(10L)),
            ringPoint(col("j") * 20, lit(10L))
          ).as("ring")
        )
      val squares = cust
        .select((k % 97).as("geoid"), ((k * 104729) % 12).as("i"))
        .dropDuplicates("geoid", "i")
        .select(
          col("geoid"),
          array(
            ringPoint(col("i") * 10, lit(10L)),
            ringPoint(col("i") * 10 + 10, lit(10L)),
            ringPoint(col("i") * 10 + 10, lit(20L)),
            ringPoint(col("i") * 10, lit(20L))
          ).as("ring")
        )
      val parts = rects.unionByName(squares)
      val np = parts.groupBy(col("geoid")).agg(count(lit(1)).as("n_parts"))
      Dissolve
        .dissolve(parts, "geoid", "ring", snapVertices = true)
        .join(broadcast(np), Seq("geoid"))
        .select(
          col("geoid"),
          col("n_parts"),
          col("area2"),
          col("n_boundary_edges"),
          col("n_interior_edges"),
          col("perimeter"),
          col("bb_x_lo"),
          col("bb_y_lo"),
          col("bb_x_hi"),
          col("bb_y_hi")
        )
    }
  )

  private def synLonSql(k: String) = s"(($k * 7919) % 36000) / 100.0 - 180.0"
  private def synLatSql(k: String) = s"(($k * 104729) % 18000) / 100.0 - 90.0"
  private def havSql(lat1: String, lon1: String, lat2: String, lon2: String) =
    s"""2.0 * 6371.0088 * asin(sqrt(
       |  pow(sin(radians($lat2 - $lat1) / 2.0), 2) +
       |  cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2.0), 2)))""".stripMargin
  private def hitsSql(words: Seq[String], c: String = "text") =
    s"len(regexp_extract_all($c, '\\b(${words.mkString("|")})\\b'))"

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")

  /** One ray-cast edge term of the q103 oracle — the SQL twin of the
    * integer comparison inside GeoFunctions.pointInRing.
    */
  private def pipEdgeSql(xi: String, yi: String, xj: String, yj: String): String =
    s"""(CASE WHEN (($yi > py) <> ($yj > py))
       |       AND (CASE WHEN ($yj - $yi) > 0
       |                 THEN (px - $xi) * ($yj - $yi) < ($xj - $xi) * (py - $yi)
       |                 ELSE (px - $xi) * ($yj - $yi) > ($xj - $xi) * (py - $yi) END)
       |      THEN 1 ELSE 0 END)""".stripMargin

  /** q103 oracle: the pentagon's 5 vertices as scalar columns, the
    * shoelace sum and crossing count unrolled — identical BIGINT
    * arithmetic to the Column-tree functions.
    */
  private lazy val q103Sql: String = {
    val vs = Seq(("x_a", "y_a"), ("x_b", "y_b"), ("x_c", "y_c"), ("x_d", "y_d"), ("x_e", "y_e"))
    val shoelace = vs.indices
      .map { i =>
        val (xi, yi) = vs(i); val (xj, yj) = vs((i + 1) % vs.size)
        s"($xi * $yj - $xj * $yi)"
      }
      .mkString(" + ")
    val crossings = vs.indices
      .map { i =>
        val (xi, yi) = vs(i); val (xj, yj) = vs((i + 1) % vs.size)
        pipEdgeSql(xi, yi, xj, yj)
      }
      .mkString(" + ")
    s"""WITH p AS (
       |  SELECT c_custkey,
       |         (c_custkey * 7919) % 30000 AS x0,
       |         (c_custkey * 104729) % 15000 AS y0,
       |         c_custkey % 80 + 20 AS w,
       |         c_custkey % 60 + 20 AS h
       |  FROM customer),
       |v AS (
       |  SELECT c_custkey,
       |         x0 AS x_a, y0 AS y_a,
       |         x0 + w AS x_b, y0 AS y_b,
       |         x0 + w AS x_c, y0 + h AS y_c,
       |         x0 + w // 2 AS x_d,
       |         CASE WHEN c_custkey % 3 = 0 THEN y0 + h // 4 ELSE y0 + 2 * h END AS y_d,
       |         x0 AS x_e, y0 + h AS y_e,
       |         x0 + w // 2 AS px,
       |         CASE WHEN c_custkey % 3 = 0 THEN y0 + h // 2 ELSE y0 + h END AS py
       |  FROM p)
       |SELECT c_custkey, CAST(5 AS BIGINT) AS n_vertices,
       |       CAST($shoelace AS BIGINT) AS area2,
       |       ($shoelace) > 0 AS is_ccw,
       |       ($crossings) % 2 = 1 AS center_in
       |FROM v""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "q103_polygon_stats" -> q103Sql,
    // the same edge cancellation as geo/Dissolve.scala: 4 directed
    // edges per CCW square via a VALUES fan-out, endpoints
    // canonicalized, cross terms summed before/after the per-edge
    // group — all BIGINT (`cross` is a DuckDB keyword, hence cross_t)
    "q124_polygon_dissolve" ->
      """WITH cells AS (
        |  SELECT DISTINCT c_custkey % 97 AS geoid,
        |         (c_custkey * 7919) % 12 AS gx,
        |         (c_custkey * 104729) % 8 AS gy
        |  FROM customer),
        |d AS (
        |  SELECT geoid,
        |         CASE i WHEN 0 THEN gx*10    WHEN 1 THEN gx*10+10 WHEN 2 THEN gx*10+10 ELSE gx*10    END AS ax,
        |         CASE i WHEN 0 THEN gy*10    WHEN 1 THEN gy*10    WHEN 2 THEN gy*10+10 ELSE gy*10+10 END AS ay,
        |         CASE i WHEN 0 THEN gx*10+10 WHEN 1 THEN gx*10+10 WHEN 2 THEN gx*10    ELSE gx*10    END AS bx,
        |         CASE i WHEN 0 THEN gy*10    WHEN 1 THEN gy*10+10 WHEN 2 THEN gy*10+10 ELSE gy*10    END AS by_
        |  FROM cells CROSS JOIN (VALUES (0), (1), (2), (3)) AS s(i)),
        |c AS (
        |  SELECT geoid,
        |         CASE WHEN ax < bx OR (ax = bx AND ay <= by_) THEN ax ELSE bx END AS ex,
        |         CASE WHEN ax < bx OR (ax = bx AND ay <= by_) THEN ay ELSE by_ END AS ey,
        |         CASE WHEN ax < bx OR (ax = bx AND ay <= by_) THEN bx ELSE ax END AS fx,
        |         CASE WHEN ax < bx OR (ax = bx AND ay <= by_) THEN by_ ELSE ay END AS fy,
        |         ax * by_ - bx * ay AS cross_t
        |  FROM d),
        |pe AS (
        |  SELECT geoid, ex, ey, fx, fy,
        |         count(*) AS mult, CAST(sum(cross_t) AS BIGINT) AS cross_t
        |  FROM c GROUP BY 1, 2, 3, 4, 5)
        |SELECT geoid,
        |       CAST((sum(CASE WHEN mult = 1 THEN 1 ELSE 0 END)
        |             + 2 * sum(CASE WHEN mult = 2 THEN 1 ELSE 0 END)) // 4 AS BIGINT) AS n_parts,
        |       CAST(sum(cross_t) AS BIGINT) AS area2,
        |       CAST(sum(CASE WHEN mult = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_edges,
        |       CAST(sum(CASE WHEN mult = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_interior_edges,
        |       CAST(sum(CASE WHEN mult = 1 THEN abs(fx - ex) + abs(fy - ey) ELSE 0 END) AS BIGINT) AS perimeter,
        |       min(CASE WHEN mult = 1 THEN least(ex, fx) END) AS bb_x_lo,
        |       min(CASE WHEN mult = 1 THEN least(ey, fy) END) AS bb_y_lo,
        |       max(CASE WHEN mult = 1 THEN greatest(ex, fx) END) AS bb_x_hi,
        |       max(CASE WHEN mult = 1 THEN greatest(ey, fy) END) AS bb_y_hi
        |FROM pe GROUP BY geoid""".stripMargin,
    // q139 oracle: the same directed-edge fan-out as q124's, two part
    // shapes (20×10 rects, 10×10 squares), then the snap replayed
    // generically: group vertices (v) joined to collinear strictly-
    // interior positions on each directed edge (sp), each edge walked
    // endpoint→splits→endpoint ordered by L1 distance along the
    // traversal (chain + lead window), sub-edges canonicalized with
    // their own cross terms, then the identical cancellation algebra.
    "q139_dissolve_snap" ->
      """WITH r0 AS (SELECT DISTINCT c_custkey % 97 AS geoid, (c_custkey * 7919) % 6 AS j FROM customer),
        |s0 AS (SELECT DISTINCT c_custkey % 97 AS geoid, (c_custkey * 104729) % 12 AS i FROM customer),
        |d AS (
        |  SELECT geoid, 0 AS kind, j AS pid, t.ei,
        |         CASE t.ei WHEN 0 THEN j*20    WHEN 1 THEN j*20+20 WHEN 2 THEN j*20+20 ELSE j*20 END AS ax,
        |         CASE t.ei WHEN 0 THEN 0       WHEN 1 THEN 0       WHEN 2 THEN 10      ELSE 10   END AS ay,
        |         CASE t.ei WHEN 0 THEN j*20+20 WHEN 1 THEN j*20+20 WHEN 2 THEN j*20    ELSE j*20 END AS bx,
        |         CASE t.ei WHEN 0 THEN 0       WHEN 1 THEN 10      WHEN 2 THEN 10      ELSE 0    END AS by_
        |  FROM r0 CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(ei)
        |  UNION ALL
        |  SELECT geoid, 1, i, t.ei,
        |         CASE t.ei WHEN 0 THEN i*10    WHEN 1 THEN i*10+10 WHEN 2 THEN i*10+10 ELSE i*10 END,
        |         CASE t.ei WHEN 0 THEN 10      WHEN 1 THEN 10      WHEN 2 THEN 20      ELSE 20   END,
        |         CASE t.ei WHEN 0 THEN i*10+10 WHEN 1 THEN i*10+10 WHEN 2 THEN i*10    ELSE i*10 END,
        |         CASE t.ei WHEN 0 THEN 10      WHEN 1 THEN 20      WHEN 2 THEN 20      ELSE 10   END
        |  FROM s0 CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(ei)),
        |v AS (SELECT DISTINCT geoid, ax AS px, ay AS py FROM d),
        |sp AS (SELECT d.geoid, d.kind, d.pid, d.ei, v.px, v.py,
        |              abs(v.px - d.ax) + abs(v.py - d.ay) AS dist
        |       FROM d JOIN v ON v.geoid = d.geoid
        |       WHERE (d.bx - d.ax) * (v.py - d.ay) = (d.by_ - d.ay) * (v.px - d.ax)
        |         AND v.px BETWEEN least(d.ax, d.bx) AND greatest(d.ax, d.bx)
        |         AND v.py BETWEEN least(d.ay, d.by_) AND greatest(d.ay, d.by_)
        |         AND NOT (v.px = d.ax AND v.py = d.ay)
        |         AND NOT (v.px = d.bx AND v.py = d.by_)),
        |chain AS (
        |  SELECT geoid, kind, pid, ei, px, py, dist FROM sp
        |  UNION ALL SELECT geoid, kind, pid, ei, ax, ay, 0 FROM d
        |  UNION ALL SELECT geoid, kind, pid, ei, bx, by_, abs(bx - ax) + abs(by_ - ay) FROM d),
        |sub AS (SELECT geoid, px AS sax, py AS say,
        |               lead(px) OVER w AS sbx, lead(py) OVER w AS sby
        |        FROM chain
        |        WINDOW w AS (PARTITION BY geoid, kind, pid, ei ORDER BY dist)),
        |c AS (SELECT geoid,
        |             CASE WHEN sax < sbx OR (sax = sbx AND say <= sby) THEN sax ELSE sbx END AS ex,
        |             CASE WHEN sax < sbx OR (sax = sbx AND say <= sby) THEN say ELSE sby END AS ey,
        |             CASE WHEN sax < sbx OR (sax = sbx AND say <= sby) THEN sbx ELSE sax END AS fx,
        |             CASE WHEN sax < sbx OR (sax = sbx AND say <= sby) THEN sby ELSE say END AS fy,
        |             sax * sby - sbx * say AS cross_t
        |      FROM sub WHERE sbx IS NOT NULL),
        |pe AS (SELECT geoid, ex, ey, fx, fy,
        |              count(*) AS mult, CAST(sum(cross_t) AS BIGINT) AS cross_t
        |       FROM c GROUP BY 1, 2, 3, 4, 5),
        |np AS (SELECT geoid, CAST(count(*) AS BIGINT) AS n_parts
        |       FROM (SELECT geoid, kind, pid FROM d GROUP BY 1, 2, 3) GROUP BY geoid)
        |SELECT pe.geoid, np.n_parts,
        |       CAST(sum(cross_t) AS BIGINT) AS area2,
        |       CAST(sum(CASE WHEN mult = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_edges,
        |       CAST(sum(CASE WHEN mult = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_interior_edges,
        |       CAST(sum(CASE WHEN mult = 1 THEN abs(fx - ex) + abs(fy - ey) ELSE 0 END) AS BIGINT) AS perimeter,
        |       min(CASE WHEN mult = 1 THEN least(ex, fx) END) AS bb_x_lo,
        |       min(CASE WHEN mult = 1 THEN least(ey, fy) END) AS bb_y_lo,
        |       max(CASE WHEN mult = 1 THEN greatest(ex, fx) END) AS bb_x_hi,
        |       max(CASE WHEN mult = 1 THEN greatest(ey, fy) END) AS bb_y_hi
        |FROM pe JOIN np USING (geoid) GROUP BY pe.geoid, np.n_parts""".stripMargin,
    "q23_utm_zone" ->
      s"""SELECT c_nationkey, modal_zone, n FROM (
         |  SELECT c_nationkey, zone AS modal_zone, count(*) AS n,
         |         row_number() OVER (PARTITION BY c_nationkey
         |                            ORDER BY count(*) DESC, zone ASC) AS rn
         |  FROM (SELECT c_nationkey,
         |               CAST(least(floor((${synLonSql("c_custkey")} + 180.0) / 6.0) + 1, 60) AS INT) AS zone
         |        FROM customer)
         |  GROUP BY c_nationkey, zone) WHERE rn = 1""".stripMargin,
    "q24_haversine" ->
      s"""SELECT c_custkey, nearest_centroid, dist_km FROM (
         |  SELECT c_custkey, cent_id AS nearest_centroid, round(d, 2) AS dist_km,
         |         row_number() OVER (PARTITION BY c_custkey ORDER BY d ASC, cent_id ASC) AS rn
         |  FROM (
         |    SELECT c_custkey, cent_id,
         |           ${havSql("lat", "lon", "cent_lat", "cent_lon")} AS d
         |    FROM (SELECT c_custkey,
         |                 ${synLatSql("c_custkey")} AS lat,
         |                 ${synLonSql("c_custkey")} AS lon
         |          FROM customer)
         |    CROSS JOIN (VALUES (0, 40.7, -74.0), (1, 51.5, -0.1), (2, 35.7, 139.7),
         |                       (3, -33.9, 151.2), (4, -23.5, -46.6)) AS c(cent_id, cent_lat, cent_lon)
         |  )) WHERE rn = 1""".stripMargin,
    "q25_point_bbox" ->
      s"""SELECT c_nationkey, count(*) AS n_points,
         |       CAST(sum(CASE WHEN lat BETWEEN 0.0 AND 60.0 AND lon BETWEEN -30.0 AND 60.0
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_in_bbox,
         |       min(lat) AS min_lat, max(lat) AS max_lat,
         |       min(lon) AS min_lon, max(lon) AS max_lon,
         |       round(CAST(sum(lat_m) AS DOUBLE) / count(*) / 100.0 - 90.0, 4) AS internal_lat,
         |       round(CAST(sum(lon_m) AS DOUBLE) / count(*) / 100.0 - 180.0, 4) AS internal_lon
         |FROM (SELECT c_nationkey,
         |             ${synLatSql("c_custkey")} AS lat,
         |             ${synLonSql("c_custkey")} AS lon,
         |             (c_custkey * 104729) % 18000 AS lat_m,
         |             (c_custkey * 7919) % 36000 AS lon_m
         |      FROM customer)
         |GROUP BY c_nationkey""".stripMargin,
    "q26_token_count" ->
      s"""SELECT doc_id,
        |       len(string_split_regex(trim(text), '$WsRun')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens
        |FROM documents""".stripMargin,
    "q27_quality_score" ->
      s"""WITH f AS (SELECT doc_id,
         |                  len(string_split_regex(trim(text), '$WsRun')) AS toks,
         |                  ${hitsSql(stopEn)} AS stop_hits,
         |                  len(regexp_extract_all(text, '[.,!?;:]')) AS punct_hits,
         |                  n_chars
         |           FROM documents)
         |SELECT doc_id, toks AS n_tokens, stop_hits, punct_hits,
         |       CAST((25 * least(n_chars, 400) + 4000) * toks
         |            + 6000 * stop_hits - 4000 * punct_hits AS DOUBLE)
         |         / (CAST(20000 AS DOUBLE) * toks) AS quality
         |FROM f""".stripMargin,
    "q28_langid" ->
      s"""SELECT doc_id,
         |       CASE WHEN en_hits > 0 AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |            WHEN es_hits > 0 AND es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |            WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
         |            WHEN de_hits > 0 THEN 'de'
         |            ELSE 'und' END AS pred_lang,
         |       en_hits, es_hits, fr_hits, de_hits
         |FROM (SELECT doc_id,
         |             ${hitsSql(Seq("the", "and", "of", "is"))} AS en_hits,
         |             ${hitsSql(Seq("el", "la", "de", "que"))} AS es_hits,
         |             ${hitsSql(Seq("le", "les", "et", "une"))} AS fr_hits,
         |             ${hitsSql(Seq("der", "die", "und", "das"))} AS de_hits
         |      FROM documents)""".stripMargin,
    "q29_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(list_transform(range(1, least(length(text), 64) + 1),
        |                                  i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |                   (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents WHERE length(text) > 0""".stripMargin,
    // arg_max's ordering key is the arithmetic twin of Spark's
    // struct(area, partId) lexicographic max — exact while
    // partId < 10^15 (documented in mergeEnvelopes)
    "q88_geo_union_merge" ->
      """WITH p AS (
        |  SELECT c_custkey % 97 AS geoid,
        |         (c_custkey * 104729) % 17000 - 8500 AS latLo,
        |         (c_custkey * 104729) % 17000 - 8500 + (c_custkey % 50 + 1) AS latHi,
        |         (c_custkey * 7919) % 35000 - 17500 AS lonLo,
        |         (c_custkey * 7919) % 35000 - 17500 + (c_custkey % 70 + 1) AS lonHi,
        |         (c_custkey % 50 + 1) * (c_custkey % 70 + 1) AS area,
        |         c_custkey AS partId
        |  FROM customer)
        |SELECT geoid, count(*) AS n_parts, count(*) - 1 AS collision_count,
        |       min(latLo) AS u_lat_lo, max(latHi) AS u_lat_hi,
        |       min(lonLo) AS u_lon_lo, max(lonHi) AS u_lon_hi,
        |       CAST(sum(area) AS BIGINT) AS total_area,
        |       arg_max(latLo + latHi, area * 1000000000000000 + partId) AS rep_lat2,
        |       arg_max(lonLo + lonHi, area * 1000000000000000 + partId) AS rep_lon2
        |FROM p GROUP BY geoid""".stripMargin
  )
}
