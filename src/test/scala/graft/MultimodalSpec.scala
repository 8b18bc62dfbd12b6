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

  /** Collected (doc_id, word vector) hashes for the sf corpus at a
    * given chunk width.
    */
  private def collectHashes(chunkBits: Int): Seq[(Long, Seq[Long])] = {
    val totalBits = Multimodal.PhashChunks * chunkBits
    val words = Multimodal.dhashWordsFromArray(col("sa"), totalBits)
    Multimodal
      .stripFrame(Tables.documents(spark, sf), "doc_id", totalBits + 1)
      // same lineage cut as the query: without it Catalyst collapses
      // the strip synthesis into every gradient comparison (huge
      // generated method -> janino gives up, interpreted fallback)
      .localCheckpoint()
      .select(col("doc_id") +: words.zipWithIndex.map { case (w, i) => w.as(s"h$i") }: _*)
      .collect()
      .map(r => (r.getLong(0), (1 until r.length).map(r.getLong)))
      .toSeq
  }

  private def bruteForce(hashes: Seq[(Long, Seq[Long])], maxDist: Int): Set[(Long, Long, Int)] =
    (for {
      (a, aw) <- hashes; (b, bw) <- hashes if a < b
      d = aw.zip(bw).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum if d <= maxDist
    } yield (a, b, d)).toSet

  test("q118: pigeonhole dHash pairs equal brute-force all-pairs Hamming, and every planted re-encode pair is found") {
    import graft.queries.MultimodalQueries.PhashMaxDist
    val nDocs = Tables.documents(spark, sf).count()
    val hashes = collectHashes(Multimodal.phashChunkBitsFor(nDocs))
    val brute = bruteForce(hashes, PhashMaxDist)
    val got = SparkEntry
      .queries("q118_phash_neardup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == brute, s"pigeonhole join diverges: missing=${brute -- got} extra=${got -- brute}")
    // every (original, re-encode) family pairs up: img = doc_id div 2,
    // so the planted pairs are exactly (2i, 2i+1) — a variant perturbs
    // <= 2 strip bytes -> <= 4 flipped bits <= radius
    val planted = (0L until nDocs / 2).map(i => (2 * i, 2 * i + 1)).toSet
    val gotPairs = got.map { case (a, b, _) => (a, b) }
    assert(planted.subsetOf(gotPairs), s"missing planted pairs: ${planted -- gotPairs}")
  }

  test("q118: the corpus-scaled chunk width follows the occupancy formula and the WIDE (3-word) geometry loses nothing") {
    import graft.queries.MultimodalQueries.PhashMaxDist
    // formula: smallest b with target·2^b >= n, clamped to the bounds
    assert(Multimodal.phashChunkBitsFor(1) == Multimodal.MinPhashChunkBits)
    assert(Multimodal.phashChunkBitsFor(8L << 14) == 14)
    assert(Multimodal.phashChunkBitsFor((8L << 14) + 1) == 15)
    assert(Multimodal.phashChunkBitsFor(250000) == 15) // the 50x scaling point runs 3 words live
    assert(Multimodal.phashChunkBitsFor(8L << 24) == 24)
    assert(Multimodal.phashChunkBitsFor(Long.MaxValue) == Multimodal.MaxPhashChunkBits)
    (1 to 20).foreach { e =>
      assert(Multimodal.phashChunkBitsFor(1L << e) <= Multimodal.phashChunkBitsFor(1L << (e + 1)))
    }
    // run the b=15 geometry (135 bits, 3 words — what a 250k corpus
    // gets) on the sf corpus: pigeonhole must still equal brute force
    val chunkBits = 15
    val totalBits = Multimodal.PhashChunks * chunkBits
    val hashes = collectHashes(chunkBits)
    assert(hashes.head._2.length == 3, "135 bits should pack into 3 words")
    val brute = bruteForce(hashes, PhashMaxDist)
    val sigs = {
      val words = Multimodal.dhashWordsFromArray(col("sa"), totalBits)
      Multimodal
        .stripFrame(Tables.documents(spark, sf), "doc_id", totalBits + 1)
        .localCheckpoint()
        .select(col("doc_id") +: words.zipWithIndex.map { case (w, i) => w.as(s"h$i") }: _*)
    }
    val got = graft.dedup.Dedup
      .hammingNearPairsWide(sigs, PhashMaxDist, totalBits, Multimodal.WordBits)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))
      .toSet
    assert(got == brute, s"wide pigeonhole diverges: missing=${brute -- got} extra=${got -- brute}")
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
