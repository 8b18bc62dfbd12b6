package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the hash-dependent operators (q32/q33/q36 — rows-only at
  * the driver gate) against their exact counterparts at sf0.001.
  */
class DedupSimSpec extends AnyFunSuite {
  import TestSpark._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry
      .queries(name)(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("minhash-LSH + exact verify finds every exact Jaccard pair (no false positives by construction)") {
    val exact = pairs("q31_dedup_ngram_jaccard")
    val lsh = pairs("q32_dedup_minhash_lsh")
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("simhash near-pairs are mostly high-Jaccard pairs") {
    val exact = pairs("q31_dedup_ngram_jaccard")
    val sim = pairs("q33_dedup_simhash")
    assert(sim.nonEmpty)
    val precision = sim.count(exact.contains).toDouble / sim.size
    assert(precision >= 0.5, s"simhash precision $precision < 0.5")
  }

  test("LSH ANN results are a subset of correct cosine ranking with decent recall@10") {
    def neighbors(name: String): Map[Long, Set[Long]] =
      SparkEntry
        .queries(name)(spark, sf)
        .select("probe_id", "neighbor_id")
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val exact = neighbors("q35_ann_bruteforce")
    val lsh = neighbors("q36_ann_lsh")
    assert(lsh.nonEmpty, "LSH ANN returned nothing")
    // every LSH neighbor must rank by true cosine within its bucket;
    // recall vs brute force is lossy by design but must be non-trivial.
    val recalls = lsh.map { case (p, ns) => ns.intersect(exact(p)).size.toDouble / exact(p).size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@10 $mean too low")
  }

  test("LSH-blocked embedding near-dups are a high-recall subset of the exact label-blocked pairs") {
    import graft.dedup.Dedup
    import graft.sources.Tables
    val exact = Dedup
      .embeddingNearDups(Tables.embeddings(spark, sf), "vec_id", "embedding", "label", 0.4)
      .select("vec_a", "vec_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = SparkEntry
      .queries("q34_dedup_embedding")(spark, sf)
      .select("vec_a", "vec_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(lsh.subsetOf(exact), s"LSH blocking emitted non-pairs: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"blocked recall $recall < 0.8 (${lsh.size}/${exact.size})")
  }

  test("exact-dedup groups partition the corpus") {
    val df = SparkEntry.queries("q30_dedup_text_exact")(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(total == 500L)
  }
}
