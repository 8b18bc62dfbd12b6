package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans
import graft.queries.DedupSimQueries.{Dims, KmeansIters, KmeansK, PqCodewords, PqSubDim, PqSubspaces}
import graft.sources.Tables

/** q119: the distributed Lloyd refinement must equal a driver-side
  * reference implementation run under the same integer contract
  * (global-scale shifted quantization, argmin ties to smallest cid,
  * integral-mean update, empty clusters keep their centroid).
  */
class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  test("q119: distributed refinement equals the driver-side Lloyd reference") {
    val q = KMeans
      .quantizeShifted(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val vecs = q.toMap

    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) => { val d = a(i) - b(i); acc + d * d })
    def argmin(v: Array[Long], cents: Map[Long, Array[Long]]): (Long, Long) =
      cents.toSeq.map { case (cid, ca) => (d2(v, ca), cid) }.min match {
        case (d, cid) => (cid, d)
      }

    var cents: Map[Long, Array[Long]] = (0L until KmeansK.toLong).map(c => c -> vecs(c)).toMap
    for (_ <- 1 to KmeansIters) {
      val assigned = q.map { case (id, v) => (id, v, argmin(v, cents)._1) }
      cents = cents.map { case (cid, old) =>
        val members = assigned.collect { case (_, v, c) if c == cid => v }
        if (members.isEmpty) cid -> old
        else {
          val n = members.length
          cid -> Array.tabulate(Dims)(i => members.map(_(i)).sum / n)
        }
      }
    }
    val expected = q.map { case (id, v) =>
      val (cid, d) = argmin(v, cents)
      (id, cid, d)
    }.toSet

    val got = SparkEntry
      .queries("q119_kmeans_refine")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected, s"diverges: missing=${expected -- got} extra=${got -- expected}")
    assert(got.map(_._2).forall(c => c >= 0 && c < KmeansK))
  }

  /** q122: the distributed PQ encoding must equal a driver-side
    * reference run under the same integer contract (subvector slicing,
    * exact integer d2, argmin ties to smallest code_id, recon_d2 =
    * sum of the per-subspace winners' distances).
    */
  test("q122: distributed PQ encoding equals the driver-side reference") {
    val q = KMeans
      .quantizeShifted(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)

    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) => { val d = a(i) - b(i); acc + d * d })
    def sub(v: Array[Long], s: Int): Array[Long] =
      v.slice(s * PqSubDim, s * PqSubDim + PqSubDim)

    val codebooks: Map[Int, Seq[(Long, Array[Long])]] =
      (0 until PqSubspaces).map { s =>
        s -> q.filter(_._1 < PqCodewords).map { case (cid, v) => (cid, sub(v, s)) }.toSeq
      }.toMap
    val expected = q.map { case (id, v) =>
      val winners = (0 until PqSubspaces).map { s =>
        codebooks(s).map { case (cid, cv) => (d2(sub(v, s), cv), cid) }.min
      }
      (id, winners.map(_._2).toVector, winners.map(_._1).sum)
    }.toSet

    val got = SparkEntry
      .queries("q122_pq_encode")(spark, sf)
      .collect()
      .map { r =>
        (r.getLong(0), (1 to PqSubspaces).map(i => r.getLong(i)).toVector, r.getLong(PqSubspaces + 1))
      }
      .toSet
    assert(got == expected, s"diverges: missing=${expected -- got} extra=${got -- expected}")
    assert(got.forall { case (_, codes, _) => codes.forall(c => c >= 0 && c < PqCodewords) })
  }

  /** The composability contract q119's scaladoc claims: Lloyd-refined
    * centroids drop into PQ as trained codebooks. Verified against a
    * driver-side argmin under the same integer contract — the
    * refined-codebook encoding must be exactly what the collected
    * centroids dictate, bit-for-bit.
    */
  test("q119 refined centroids feed pqEncodeWith as trained codebooks") {
    import org.apache.spark.sql.functions.col
    import graft.sim.Similarity
    val qdf = KMeans.quantizeShifted(Tables.embeddings(spark, sf), "vec_id", "embedding")
    val centsDf = KMeans.refineCentroids(qdf, KmeansK, KmeansIters, Dims)
    val got = Similarity
      .pqEncodeWith(qdf, centsDf.select(col("cid").as("vec_id"), col("ca").as("qa")), PqSubspaces, PqSubDim)
      .collect()
      .map { r =>
        (r.getLong(0), (1 to PqSubspaces).map(i => r.getLong(i)).toVector, r.getLong(PqSubspaces + 1))
      }
      .toSet

    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) => { val d = a(i) - b(i); acc + d * d })
    def sub(v: Array[Long], s: Int): Array[Long] =
      v.slice(s * PqSubDim, s * PqSubDim + PqSubDim)
    val q = qdf.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val cents = centsDf.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    assert(cents.length == KmeansK)
    val expected = q.map { case (id, v) =>
      val winners = (0 until PqSubspaces).map { s =>
        cents.map { case (cid, cv) => (d2(sub(v, s), sub(cv, s)), cid) }.min
      }
      (id, winners.map(_._2).toVector, winners.map(_._1).sum)
    }.toSet
    assert(got == expected, s"diverges: missing=${expected -- got} extra=${got -- expected}")
  }

  /** q123: the distributed ADC scan must equal a driver-side reference
    * that encodes every vector, builds each probe's distance table,
    * and ranks by (adc_d2, vec_id) — including the table-lookup
    * approximation error (adc uses the probe's EXACT subvectors
    * against the neighbor's QUANTIZED codes, never neighbor coords).
    */
  test("q123: distributed ADC top-k equals the driver-side reference") {
    val q = KMeans
      .quantizeShifted(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)

    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) => { val d = a(i) - b(i); acc + d * d })
    def sub(v: Array[Long], s: Int): Array[Long] =
      v.slice(s * PqSubDim, s * PqSubDim + PqSubDim)

    val codebooks: Map[Int, Seq[(Long, Array[Long])]] =
      (0 until PqSubspaces).map { s =>
        s -> q.filter(_._1 < PqCodewords).map { case (cid, v) => (cid, sub(v, s)) }.toSeq
      }.toMap
    val codes: Map[Long, Vector[Long]] = q.map { case (id, v) =>
      id -> (0 until PqSubspaces).map { s =>
        codebooks(s).map { case (cid, cv) => (d2(sub(v, s), cv), cid) }.min._2
      }.toVector
    }.toMap

    val probes = q.filter(_._1 < 5)
    val topK = graft.queries.DedupSimQueries.AnnK
    val expected = probes.flatMap { case (pid, pv) =>
      val dtable: Map[(Int, Long), Long] =
        (0 until PqSubspaces).flatMap { s =>
          codebooks(s).map { case (cid, cv) => (s, cid) -> d2(sub(pv, s), cv) }
        }.toMap
      q.filter(_._1 != pid)
        .map { case (vid, _) =>
          val adc = (0 until PqSubspaces).map(s => dtable((s, codes(vid)(s)))).sum
          (adc, vid)
        }
        .sorted
        .take(topK)
        .zipWithIndex
        .map { case ((adc, vid), i) => (pid, (i + 1).toLong, vid, adc) }
    }.toSet

    val got = SparkEntry
      .queries("q123_pq_adc_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"diverges: missing=${expected -- got} extra=${got -- expected}")
  }

  /** The two-level theorem: on a corpus whose coarse cells are
    * well-separated (tight blobs, one fine seed per blob, blob
    * separation orders beyond blob radius), refineTwoLevel's
    * cell-restricted assignment equals flat refine — same clusters,
    * same centroids, same exact dist2 per vector. The approximation
    * the two-level path trades away only bites when a vector's
    * nearest fine centroid lives in a FOREIGN coarse cell, which
    * well-separation precludes.
    */
  test("two-level refinement equals flat refinement on a well-separated corpus") {
    import spark.implicits._
    val groups = 9
    val n = 180
    val dims = 8
    val rnd = new scala.util.Random(19)
    // group g's blob center: (100·(g%3), 100·(g/3), 0...) — blobs 100
    // apart in the leading dims, jitter ±2 confined to dims 2..7 so no
    // blob can straddle a Voronoi boundary; vec_ids 0..8 are one per
    // blob (the seeding convention both paths share)
    val rows = (0 until n).map { id =>
      val g = id % groups
      val v = Array.tabulate(dims) { d =>
        if (d == 0) (g % 3) * 100.0
        else if (d == 1) (g / 3) * 100.0
        else (rnd.nextInt(5) - 2).toDouble
      }
      (id.toLong, v.toSeq)
    }
    val q = KMeans
      .quantizeShifted(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .localCheckpoint()
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val flat = run(KMeans.refine(q, groups, 3, dims))
    val two = run(KMeans.refineTwoLevel(q, groups, 3, dims))
    assert(two == flat, s"two-level diverges from flat: missing=${flat -- two} extra=${two -- flat}")
    // and the labeling recovers the planted blobs exactly
    val byCluster = flat.groupBy(_._2).values.map(_.map(_._1 % groups)).toSeq
    assert(byCluster.size == groups)
    byCluster.foreach(members => assert(members.toSet.size == 1, s"cluster mixes blobs: $members"))
    // rank seeding ≡ dense-id seeding when ids are dense from 0 (the
    // pipeline-stage variant must be a strict generalization)
    val ranked = run(KMeans.refineTwoLevelRankSeeded(q, groups, 3, dims))
    assert(ranked == two, "rank-seeded diverges from dense-id seeding on a dense corpus")
  }

  test("two-level k-means works on a SPARSE id space (rank seeding is the default since round 12)") {
    import spark.implicits._
    // ids 100, 205, 310, ... — nothing below k. The pre-r12 dense-id
    // contract (`vec_id < k` seeds) RAISED here, which the 100×
    // scaling point hit for real: ScaleUp's replica stride leaves
    // only the base corpus's ids dense while the corpus-scaled
    // k = N/target grows past them. Seeds are now the k smallest ids
    // PRESENT on every path (identical on dense corpora — pinned in
    // the previous test), so sparse spaces train instead of raising.
    val rows = (0 until 60).map { i =>
      (100L + 105L * i, Seq.tabulate(4)(d => if (d == i % 2) 50.0 + i else (i % 3).toDouble))
    }
    val q = KMeans
      .quantizeShifted(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .localCheckpoint()
    val got = KMeans.refineTwoLevel(q, 4, 1, 4).collect()
    assert(got.length == 60, "every vector must be assigned")
    // cluster ids are the 4 smallest vec_ids (the rank seeds)
    val seedIds = rows.map(_._1).sorted.take(4).toSet
    assert(got.map(_.getLong(1)).toSet.subsetOf(seedIds))
    // the explicit rank-seeded entry point is the same computation
    val ranked = KMeans.refineTwoLevelRankSeeded(q, 4, 1, 4).collect()
    assert(ranked.map(r => (r.getLong(0), r.getLong(1))).toSet == got.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
