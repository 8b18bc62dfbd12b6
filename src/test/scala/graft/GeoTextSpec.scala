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
    // envelope sanity: hull bounds are ordered and area is positive
    assert(out.filter(col("u_lat_lo") > col("u_lat_hi") || col("u_lon_lo") > col("u_lon_hi")).count() == 0)
    assert(out.filter(col("total_area") <= 0).count() == 0)
    out.unpersist()
  }
}
