package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.GeoFunctions
import graft.text.TextFunctions

class GeoTextSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("utmZone maps longitudes to zones 1..60") {
    val df = Seq(-180.0, -179.9, 0.0, 6.0, 179.9).toDF("lon")
    val zones = df.select(GeoFunctions.utmZone(col("lon"))).as[Int].collect().toSeq
    assert(zones == Seq(1, 1, 31, 32, 60))
  }

  test("haversine London-Paris ~343 km") {
    val d = Seq(1).toDF("x")
      .select(GeoFunctions.haversineKm(lit(51.5074), lit(-0.1278), lit(48.8566), lit(2.3522)))
      .as[Double].head()
    assert(math.abs(d - 343.5) < 1.0, s"got $d")
  }

  test("token counts and stopword hits on a known sentence") {
    val df = Seq("the cat sat on the mat.").toDF("text")
    val r = df.select(
      TextFunctions.tokenCountWs(col("text")),
      TextFunctions.tokenCountRe(col("text")),
      TextFunctions.stopwordHits(col("text")),
      TextFunctions.punctHits(col("text"))
    ).as[(Int, Int, Int, Int)].head()
    assert(r == ((6, 6, 2, 1)))
  }

  test("fingerprint matches hand-computed Karp-Rabin fold") {
    val expected = "hello".foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val fp = Seq("hello").toDF("text")
      .select(TextFunctions.fingerprint("text")).as[Long].head()
    assert(fp == expected)
  }

  test("langId picks the dominant stopword language") {
    val df = Seq("the cat and the dog is of note", "el perro de la casa que ladra").toDF("text")
    val langs = df.select(TextFunctions.langId(col("text"))).as[String].collect().toSeq
    assert(langs == Seq("en", "es"))
  }

  test("word shingles produce overlapping n-grams") {
    val sh = Seq("a b c d").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 2)).as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))
  }

  test("shoelace2 and pointInRing agree with hand-computed values on square and concave rings") {
    // unit square ×10: area2 = 200, CCW; dart (concave) polygon: the
    // bbox center is OUTSIDE — the case a true interior point exists for
    def ring(pts: (Long, Long)*) =
      array(pts.map { case (x, y) => GeoFunctions.ringPoint(lit(x), lit(y)) }: _*)
    val square = ring((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    // dart: notch dips to (5, 2) between the top corners
    val dart = ring((0L, 0L), (10L, 0L), (10L, 10L), (5L, 2L), (0L, 10L))
    val r = Seq(1)
      .toDF("x")
      .select(
        GeoFunctions.shoelace2(square).as("sq_area2"),
        GeoFunctions.shoelace2(dart).as("dart_area2"),
        GeoFunctions.pointInRing(lit(5L), lit(5L), square).as("sq_center"),
        GeoFunctions.pointInRing(lit(11L), lit(5L), square).as("sq_out"),
        GeoFunctions.pointInRing(lit(5L), lit(5L), dart).as("dart_center"),
        GeoFunctions.pointInRing(lit(2L), lit(5L), dart).as("dart_wing"),
        // clockwise square: negative signed area, PIP parity unaffected
        GeoFunctions.shoelace2(ring((0L, 0L), (0L, 10L), (10L, 10L), (10L, 0L))).as("cw_area2")
      )
      .head()
    assert(r.getLong(0) == 200L, s"square area2 ${r.getLong(0)}")
    // dart area: square minus the notch triangle ((0,10),(5,2),(10,10)): 2A = 200 - 80 = 120
    assert(r.getLong(1) == 120L, s"dart area2 ${r.getLong(1)}")
    assert(r.getBoolean(2), "square center must be inside")
    assert(!r.getBoolean(3), "point right of the square must be outside")
    assert(!r.getBoolean(4), "dart bbox center sits in the notch - outside")
    assert(r.getBoolean(5), "dart wing point must be inside")
    assert(r.getLong(6) == -200L, "clockwise winding must flip the sign")
    // degenerate rings: empty/1-point/2-point yield area 0 and contain
    // nothing (the empty case would otherwise hit ANSI modulo-by-zero)
    val deg = Seq(1)
      .toDF("x")
      .select(
        GeoFunctions.shoelace2(array().cast("array<struct<x:bigint,y:bigint>>")).as("a0"),
        GeoFunctions.shoelace2(ring((1L, 1L), (5L, 5L))).as("a2"),
        GeoFunctions.pointInRing(lit(0L), lit(0L), array().cast("array<struct<x:bigint,y:bigint>>")).as("p0"),
        GeoFunctions.pointInRing(lit(3L), lit(3L), ring((1L, 1L), (5L, 5L))).as("p2")
      )
      .head()
    assert(deg.getLong(0) == 0L && deg.getLong(1) == 0L, "degenerate rings must have zero area")
    assert(!deg.getBoolean(2) && !deg.getBoolean(3), "nothing is inside a degenerate ring")
  }

  test("q103: concave pentagons reject the bbox center, convex ones keep it; area matches a JVM shoelace") {
    val out = SparkEntry.queries("q103_polygon_stats")(spark, sf).cache()
    val n = graft.sources.Tables.customer(spark, sf).count()
    assert(out.count() == n, "one polygon row per customer")
    // the split the synth guarantees: k % 3 == 0 -> notch -> center out
    assert(out.filter(col("c_custkey") % 3 === 0 && col("center_in")).count() == 0, "a notched center leaked inside")
    assert(out.filter(col("c_custkey") % 3 =!= 0 && !col("center_in")).count() == 0, "a spiked center fell outside")
    assert(out.filter(!col("is_ccw") || col("area2") <= 0).count() == 0, "synth rings are CCW-positive")
    // cross-check the Column-tree shoelace against plain JVM arithmetic
    out.select("c_custkey", "area2").collect().take(200).foreach { r =>
      val k = r.getLong(0)
      val (x0, y0, w, h) = (k * 7919 % 30000, k * 104729 % 15000, k % 80 + 20, k % 60 + 20)
      val apexY = if (k % 3 == 0) y0 + h / 4 else y0 + 2 * h
      val vs = Seq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0 + w / 2, apexY), (x0, y0 + h))
      val jvm = vs.indices.map { i =>
        val (xi, yi) = vs(i); val (xj, yj) = vs((i + 1) % vs.size)
        xi * yj - xj * yi
      }.sum
      assert(r.getLong(1) == jvm, s"key $k: area2 ${r.getLong(1)} != JVM $jvm")
    }
    out.unpersist()
  }

  test("q88 envelope union covers every part and keeps an interior representative point") {
    val out = SparkEntry.queries("q88_geo_union_merge")(spark, sf).cache()
    // every customer part lands in exactly one merged geoid row
    val nCustomers = graft.sources.Tables.customer(spark, sf).count()
    assert(out.agg(sum(col("n_parts"))).head.getLong(0) == nCustomers)
    // the representative point (doubled units) is inside the union
    // envelope — the guarantee a downstream point-in-geo check relies on
    val escaped = out.filter(
      col("rep_lat2") < col("u_lat_lo") * 2 || col("rep_lat2") > col("u_lat_hi") * 2 ||
        col("rep_lon2") < col("u_lon_lo") * 2 || col("rep_lon2") > col("u_lon_hi") * 2
    )
    assert(escaped.count() == 0, "representative point escaped the union envelope")
    // the same containment through q103's ray-cast PIP predicate: the
    // doubled rep point is strictly inside the doubled envelope ring
    // (rep = a part's center, parts have ≥1-unit extent, so it clears
    // the hull edge by ≥1 doubled unit — never ON the boundary)
    val viaPip = out
      .select(
        GeoFunctions
          .pointInRing(
            col("rep_lon2"),
            col("rep_lat2"),
            array(
              GeoFunctions.ringPoint(col("u_lon_lo") * 2, col("u_lat_lo") * 2),
              GeoFunctions.ringPoint(col("u_lon_hi") * 2, col("u_lat_lo") * 2),
              GeoFunctions.ringPoint(col("u_lon_hi") * 2, col("u_lat_hi") * 2),
              GeoFunctions.ringPoint(col("u_lon_lo") * 2, col("u_lat_hi") * 2)
            )
          )
          .as("in")
      )
      .filter(!col("in"))
      .count()
    assert(viaPip == 0, "ray-cast PIP disagrees with the envelope containment")
    // envelope sanity: hull bounds are ordered and area is positive
    assert(out.filter(col("u_lat_lo") > col("u_lat_hi") || col("u_lon_lo") > col("u_lon_hi")).count() == 0)
    assert(out.filter(col("total_area") <= 0).count() == 0)
    out.unpersist()
  }

  test("q124: edge-cancellation dissolve equals a driver-side union reference") {
    val cells = graft.sources.Tables
      .customer(spark, sf)
      .select(
        (col("c_custkey") % 97).as("geoid"),
        ((col("c_custkey") * 7919) % 12).as("gx"),
        ((col("c_custkey") * 104729) % 8).as("gy")
      )
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).toSet }
    val expected = cells.map { case (g, cs) =>
      // each 10×10 cell contributes 4 canonical edges; interior edges
      // are the ones two cells share
      val edgeCount = scala.collection.mutable.Map.empty[(Long, Long, Long, Long), Int].withDefaultValue(0)
      cs.foreach { case (gx, gy) =>
        val (x0, y0) = (gx * 10, gy * 10)
        Seq(
          (x0, y0, x0 + 10, y0),
          (x0 + 10, y0, x0 + 10, y0 + 10),
          (x0, y0 + 10, x0 + 10, y0 + 10),
          (x0, y0, x0, y0 + 10)
        ).foreach(e => edgeCount(e) += 1)
      }
      val boundary = edgeCount.filter(_._2 == 1).keys.toSeq
      val nB = boundary.size.toLong
      val nI = edgeCount.values.count(_ == 2).toLong
      val bbX = boundary.flatMap(e => Seq(e._1, e._3))
      val bbY = boundary.flatMap(e => Seq(e._2, e._4))
      g -> ((cs.size.toLong, 200L * cs.size, nB, nI, 10L * nB, bbX.min, bbY.min, bbX.max, bbY.max))
    }
    val got = SparkEntry
      .queries("q124_polygon_dissolve")(spark, sf)
      .collect()
      .map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))
      }
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (g, e) => assert(got(g) == e, s"geoid $g: ${got(g)} != $e") }
  }

  test("dissolve raises loudly when parts overlap (the planar-partition contract)") {
    import graft.geo.Dissolve
    def square(x0: Long, y0: Long) = Seq(
      (x0, y0), (x0 + 10, y0), (x0 + 10, y0 + 10), (x0, y0 + 10)
    )
    def partsDf(parts: Seq[Seq[(Long, Long)]]) = {
      val rows = parts.zipWithIndex.map { case (vs, i) => (1L, i.toLong, vs) }
      rows
        .toDF("geoid", "part", "vs")
        .select(
          col("geoid"),
          expr("transform(vs, v -> struct(v._1 AS x, v._2 AS y))").as("ring")
        )
    }
    // duplicated part: shared edges run the SAME direction, cross
    // terms don't cancel — must raise, not report a doubled area
    val dup = intercept[Exception] {
      Dissolve.dissolve(partsDf(Seq(square(0, 0), square(0, 0))), "geoid", "ring").collect()
    }
    assert(dup.getMessage.contains("planar partition"), dup.getMessage)
    // a valid 2-cell partition on the same frame builder passes and
    // cancels exactly one shared edge
    val ok = Dissolve
      .dissolve(partsDf(Seq(square(0, 0), square(10, 0))), "geoid", "ring")
      .collect()
      .head
    assert(ok.getLong(1) == 400L, "union area2")
    assert(ok.getLong(2) == 6L && ok.getLong(3) == 1L, "6 boundary + 1 cancelled interior edge")
  }

  test("snapVertices dissolves a planted T-junction correctly (and is identity on exact-vertex input)") {
    import graft.geo.Dissolve
    def ringDf(parts: Seq[Seq[(Long, Long)]]) =
      parts
        .map(vs => (1L, vs))
        .toDF("geoid", "vs")
        .select(col("geoid"), expr("transform(vs, v -> struct(v._1 AS x, v._2 AS y))").as("ring"))
    // a 20×10 rectangle with a 10×10 square on its top-LEFT half: the
    // square's corner (10,10) sits strictly inside the rectangle's top
    // edge — the exact T-junction q124's exact-vertex contract
    // declares out of scope. Snapping must split the top edge there,
    // cancel the left half against the square's bottom edge, and keep
    // the right half as boundary.
    val rect = Seq((0L, 0L), (20L, 0L), (20L, 10L), (0L, 10L))
    val square = Seq((0L, 10L), (10L, 10L), (10L, 20L), (0L, 20L))
    val got = Dissolve
      .dissolve(ringDf(Seq(rect, square)), "geoid", "ring", snapVertices = true)
      .collect()
      .head
    assert(got.getLong(1) == 600L, "area2: 2 * (200 + 100)")
    assert(got.getLong(2) == 7L, "boundary edges of the L-shape after the split")
    assert(got.getLong(3) == 1L, "exactly the repaired junction cancels")
    assert(got.getLong(4) == 80L, "L-shape perimeter")
    assert((got.getLong(5), got.getLong(6), got.getLong(7), got.getLong(8)) == ((0L, 0L, 20L, 20L)))
    // without snapping the same input mis-reports the junction as
    // boundary on both sides (the declared failure the widened
    // contract repairs); area2 still cancels arithmetically
    val raw = Dissolve.dissolve(ringDf(Seq(rect, square)), "geoid", "ring").collect().head
    assert(raw.getLong(2) == 8L && raw.getLong(3) == 0L, "unsnapped T-junction miscounts edges")
    // on exact-vertex-matched parts the snap finds nothing to insert
    // and both modes agree bit-for-bit
    val twoCells = Seq(
      Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L)),
      Seq((10L, 0L), (20L, 0L), (20L, 10L), (10L, 10L))
    )
    val a = Dissolve.dissolve(ringDf(twoCells), "geoid", "ring").collect().head
    val b = Dissolve.dissolve(ringDf(twoCells), "geoid", "ring", snapVertices = true).collect().head
    assert(a == b, "snap must be the identity when the exact-vertex contract already holds")
  }

  test("q139: snapped dissolve matches a driver-side union reference on the mixed-size parts") {
    val k = col("c_custkey")
    val groups = graft.sources.Tables
      .customer(spark, sf)
      .select((k % 97).as("geoid"), ((k * 7919) % 6).as("j"), ((k * 104729) % 12).as("i"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = groups.map { case (g, rows) =>
      val rects = rows.map(_._2).toSet
      val squares = rows.map(_._3).toSet
      // rasterize the union on the 10-unit grid: rect j covers cells
      // (2j, 0) and (2j+1, 0); square i covers cell (i, 1)
      val cells =
        rects.flatMap(j => Set((2 * j, 0L), (2 * j + 1, 0L))) ++ squares.map(i => (i, 1L))
      val edgeCount = scala.collection.mutable.Map.empty[(Long, Long, Long, Long), Int].withDefaultValue(0)
      cells.foreach { case (cx, cy) =>
        val (x0, y0) = (cx * 10, cy * 10)
        Seq(
          (x0, y0, x0 + 10, y0),
          (x0 + 10, y0, x0 + 10, y0 + 10),
          (x0, y0 + 10, x0 + 10, y0 + 10),
          (x0, y0, x0, y0 + 10)
        ).foreach(e => edgeCount(e) += 1)
      }
      val boundary = edgeCount.filter(_._2 == 1).keys.toSeq
      val bbX = boundary.flatMap(e => Seq(e._1, e._3))
      val bbY = boundary.flatMap(e => Seq(e._2, e._4))
      g -> ((rects.size.toLong + squares.size, 200L * cells.size, bbX.min, bbY.min, bbX.max, bbY.max))
    }
    val got = SparkEntry
      .queries("q139_dissolve_snap")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (g, e) => assert(got(g) == e, s"geoid $g: ${got(g)} != $e") }
  }

  test("q124 dissolve agrees with q88's envelope merge on the same cells (the real-geometry upgrade)") {
    val k = col("c_custkey")
    val cellEnvs = graft.sources.Tables
      .customer(spark, sf)
      .select((k % 97).as("geoid"), ((k * 7919) % 12).as("gx"), ((k * 104729) % 8).as("gy"))
      .dropDuplicates("geoid", "gx", "gy")
      .select(
        col("geoid"),
        (col("gy") * 10).as("latLo"),
        (col("gy") * 10 + 10).as("latHi"),
        (col("gx") * 10).as("lonLo"),
        (col("gx") * 10 + 10).as("lonHi"),
        lit(100L).as("area"),
        (col("gx") * 8 + col("gy")).as("partId")
      )
    val env = graft.etl.CollisionMerge
      .mergeEnvelopes(cellEnvs, "geoid")
      .select("geoid", "n_parts", "u_lat_lo", "u_lat_hi", "u_lon_lo", "u_lon_hi", "total_area")
    val dis = SparkEntry.queries("q124_polygon_dissolve")(spark, sf)
    // the dissolve's true-boundary bbox IS the envelope hull, its
    // doubled union area is twice the summed part area (disjoint
    // cells), and both see the same part count
    val disagree = dis
      .join(env, "geoid")
      .filter(
        col("bb_x_lo") =!= col("u_lon_lo") || col("bb_x_hi") =!= col("u_lon_hi") ||
          col("bb_y_lo") =!= col("u_lat_lo") || col("bb_y_hi") =!= col("u_lat_hi") ||
          col("area2") =!= col("total_area") * 2 || dis("n_parts") =!= env("n_parts")
      )
    assert(disagree.count() == 0, "dissolve and envelope merge disagree")
  }
}
