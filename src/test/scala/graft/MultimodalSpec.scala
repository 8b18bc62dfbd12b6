package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ingest
import graft.multimodal.{MediaRecord, Multimodal}
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def media = Multimodal.synthesize(Tables.documents(spark, sf))

  test("payload synthesis is deterministic and magic-prefixed") {
    val m = Multimodal.extractMeta(media)
    // sniffed format (from bytes) always agrees with the declared one
    assert(m.filter(col("fmt") =!= col("sniffed_fmt")).count() == 0)
    // 4 magic bytes + 3 × 32 sha bytes
    assert(m.filter(col("byte_size") =!= 100).count() == 0)
    // two runs produce identical checksums (no nondeterminism anywhere)
    val a = m.select("doc_id", "checksum").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Multimodal.extractMeta(media).select("doc_id", "checksum").collect()
    b.foreach(r => assert(a(r.getLong(0)) == r.getString(1)))
  }

  test("decode stub runs partition-batched and matches Column-side stats") {
    import spark.implicits._
    val ds = media.select("doc_id", "fmt", "payload", "width", "height").as[MediaRecord]
    val feats = Multimodal.decode(ds.repartition(4))
    val fRows = feats.collect()
    assert(fRows.length == 500)
    assert(fRows.forall(_.n_bytes == 100))
    // first byte equals the magic's first byte
    val magicFirst = Map("png" -> 0x89, "jpeg" -> 0xff, "wav" -> 0x52)
    fRows.foreach(f => assert(f.first_byte == magicFirst(f.fmt)))
    // deterministic: re-running decode yields identical means
    val again = Multimodal.decode(ds.repartition(7)).collect().map(f => f.doc_id -> f.mean_byte).toMap
    fRows.foreach(f => assert(again(f.doc_id) == f.mean_byte))
  }

  test("resize stub fits every record inside the box, preserving aspect ratio") {
    import spark.implicits._
    val ds = media.select("doc_id", "fmt", "payload", "width", "height").as[MediaRecord]
    val before = ds.collect().map(r => r.doc_id -> r).toMap
    val resized = Multimodal.resize(ds.repartition(4), maxW = 64, maxH = 64).collect()
    assert(resized.length == before.size)
    resized.foreach { r =>
      val o = before(r.doc_id)
      assert(r.width <= 64 && r.height <= 64, s"doc ${r.doc_id} not fitted: ${r.width}x${r.height}")
      if (o.width <= 64 && o.height <= 64) {
        assert(r.width == o.width && r.height == o.height, "already-fitting record must pass through")
        assert(r.payload.length == o.payload.length)
      } else {
        // the binding axis lands exactly on the box edge, orientation
        // is preserved, payload only shrinks
        assert(r.width == 64 || r.height == 64, s"no axis binds for ${r.doc_id}: ${r.width}x${r.height}")
        if (o.width > o.height) assert(r.width >= r.height, s"orientation flipped for ${r.doc_id}")
        if (o.height > o.width) assert(r.height >= r.width, s"orientation flipped for ${r.doc_id}")
        assert(r.payload.length <= o.payload.length)
      }
    }
  }

  test("q118: pigeonhole dHash pairs equal brute-force all-pairs Hamming, and every planted re-encode pair is found") {
    import graft.queries.MultimodalQueries.PhashMaxDist
    val words = Multimodal.dhash126FromArray(col("sa"))
    val hashes = Tables
      .documents(spark, sf)
      .select(col("doc_id"), array(Multimodal.lumaStrip(col("doc_id")): _*).as("sa"))
      .select(col("doc_id"), words(0).as("h0"), words(1).as("h1"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force ground truth over the collected two-word 126-bit hashes
    val brute = (for {
      (a, a0, a1) <- hashes; (b, b0, b1) <- hashes if a < b
      d = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1) if d <= PhashMaxDist
    } yield (a, b, d)).toSet
    val got = SparkEntry
      .queries("q118_phash_neardup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == brute, s"pigeonhole join diverges: missing=${brute -- got} extra=${got -- brute}")
    // every image with a re-encode variant pairs with its original:
    // a variant perturbs <=2 strip bytes -> <=4 flipped bits <= radius
    val nDocs = hashes.length
    val planted = (0L until (nDocs - Multimodal.ReencodeImages).toLong)
      .map(i => (i, i + Multimodal.ReencodeImages))
      .toSet
    val gotPairs = got.map { case (a, b, _) => (a, b) }
    assert(planted.subsetOf(gotPairs), s"missing planted pairs: ${planted -- gotPairs}")
  }

  test("ingest manifest partitions the corpus and has stable hashes") {
    val man = Ingest.manifest(Tables.documents(spark, sf)).collect()
    assert(man.map(_.getLong(1)).sum == 500L)
    // checksums are 64-hex and stable across runs
    val again = Ingest.manifest(Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) -> (r.getString(3), r.getString(4))).toMap
    man.foreach { r =>
      assert(r.getString(3).matches("[0-9a-f]{64}"))
      assert(again(r.getString(0)) == ((r.getString(3), r.getString(4))))
    }
  }
}
