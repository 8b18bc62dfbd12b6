package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DedupSimQueries
import graft.sources.Tables

/** Measure the hybrid-retrieval stack (q140's lexical / semantic /
  * RRF-fused channels) against the PLANTED cross-modal truth — the
  * r14 verdict #5 gap: with disjoint lexical/semantic truths the
  * fused system had no probe it could WIN, so RRF's value proposition
  * (a doc mid-ranked by BOTH channels outranks each channel's unique
  * noise) was never a measured number. ScaleUp's round-15 cross-modal
  * families stage exactly that situation per planted base (see the
  * X/S/T construction in ScaleUp): the probe is the BASE doc, the
  * planted truth is its cross-modal twin X, the semantic channel's
  * noise is S (cosine 0.95, lexically invisible), the lexical
  * channel's noise is T (~75% token overlap, semantically
  * orthogonal). This main runs the identical q140 machinery over
  * those probes and reports hits@k / MRR per system against THREE
  * truths (planted / exact cosine / exact bm25), plus the per-channel
  * ranks of X, S, T — the construction's premise made auditable.
  *
  * Round 16 (r15 verdict #5 — "8 probes / 1 decade proves the
  * mechanism, not the measurement"): probes draw from EVERY replica's
  * planted X bases (not just replica 0), nProbes=0 means all eligible
  * bases, and the X/S/T ranks are reported as DISTRIBUTIONS
  * (mean/p50/p90/max + found count + fused win rate), not means
  * alone.
  *
  * Usage: sbt "runMain graft.FusionProbe [derivedDir] [nProbes]"
  *   output: one JSON line + SPARK_GRAFT_FUSION_OUT
  *   (default /tmp/r15/fusion_<basename>.json)
  */
object FusionProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf256-derived")
    val nProbes = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    import DedupSimQueries.FusionTopK

    val emb = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir)
    // probes: cross-modal X bases from all int-range replicas (see
    // below) whose X partner doc AND all three embedding partners
    // actually landed (guard drops are rare but the truth must be
    // exact)
    val vecIds = emb.select(col("vec_id")).localCheckpoint()
    // X bases from every INT-RANGE replica (planting is replica-local
    // with the same within-replica offset; KeyStride is divisible by
    // PlantMod, so the residue arithmetic is replica-agnostic). The
    // Bm25 query-id type caps probe ids at Int.MaxValue — replicas
    // 0-2 qualify, supplying ~102 X bases at any decade (n ≥ 64, the
    // r15 verdict's floor; r15 itself used 8 replica-0 probes).
    val bases = vecIds
      .filter(
        col("vec_id") <= Int.MaxValue.toLong &&
          pmod(col("vec_id"), lit(ScaleUp.KeyStride)) < ScaleUp.PlantOffset &&
          pmod(col("vec_id"), lit(ScaleUp.PlantMod)) === ScaleUp.CrossModalResidue
      )
      .select(col("vec_id").as("base"))
    def having(shift: Long): DataFrame =
      bases.join(vecIds.select((col("vec_id") - ScaleUp.PlantOffset - shift).as("base")), Seq("base"), "left_semi")
    val eligible = having(0)
      .join(having(1), Seq("base"), "left_semi")
      .join(having(2), Seq("base"), "left_semi")
      .join(docs.select((col("doc_id") - ScaleUp.PlantOffset).as("base")), Seq("base"), "left_semi")
      .orderBy(col("base"))
    val probeIds = (if (nProbes > 0) eligible.limit(nProbes) else eligible)
      .collect()
      .map(_.getLong(0))
      .toSeq
    require(probeIds.nonEmpty, s"no cross-modal planted bases found in $dir — regenerate with r15 ScaleUp")

    val (lex, sem, fused) = DedupSimQueries.hybridFramesFor(spark, dir, probeIds)
    val lexC = lex.localCheckpoint()
    val semC = sem.localCheckpoint()
    val fusedC = fused.localCheckpoint()

    // truths
    val planted = pairsDF(spark, probeIds.map(b => (b, b + ScaleUp.PlantOffset)))
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cosTruth = graft.sim.Similarity
      .bruteForceTopK(e, e.filter(col("vec_id").isin(probeIds: _*)), FusionTopK)
      .select(col("probe_id").as("query_id"), col("neighbor_id").as("doc_id"))
      .localCheckpoint()
    val lexTruth = lexC.select(col("query_id"), col("doc_id"))

    def metrics(cand: DataFrame, rankCol: String, truth: DataFrame): (Double, Double) = {
      val rows = cand
        .join(truth.withColumn("hit", lit(1)), Seq("query_id", "doc_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(
          sum(coalesce(col("hit"), lit(0))).as("n_hits"),
          min(when(col("hit") === 1, col(rankCol))).as("fr")
        )
        .collect()
      val n = math.max(rows.length, 1)
      val hits = rows.map(_.getLong(1)).sum.toDouble / n
      val mrr = rows.map(r => if (r.isNullAt(2)) 0.0 else 1.0 / r.getInt(2)).sum / n
      (hits, mrr)
    }

    def sysJson(name: String, cand: DataFrame, rankCol: String): String = {
      val (hP, mP) = metrics(cand, rankCol, planted)
      val (hC, mC) = metrics(cand, rankCol, cosTruth)
      val (hB, mB) = metrics(cand, rankCol, lexTruth)
      f""""$name":{"planted":{"mean_hits":$hP%.4f,"mrr":$mP%.4f},""" +
        f""""cosine":{"mean_hits":$hC%.4f,"mrr":$mC%.4f},""" +
        f""""bm25":{"mean_hits":$hB%.4f,"mrr":$mB%.4f}}"""
    }

    // the construction's premise, audited: per-channel rank
    // DISTRIBUTIONS of X/S/T (r16 — means alone hid the tails), plus
    // the fused win rate on X (rank 1 = the cross-modal twin outranks
    // both channels' noise docs)
    def rankOf(cand: DataFrame, rankCol: String, shift: Long): String = {
      val t = pairsDF(spark, probeIds.map(b => (b, b + ScaleUp.PlantOffset + shift)))
      val rs = cand
        .join(t, Seq("query_id", "doc_id"))
        .select(col(rankCol))
        .collect()
        .map(_.getInt(0))
        .sorted
      if (rs.isEmpty) "null"
      else {
        def q(p: Double) = rs(math.min(rs.length - 1, (p * rs.length).toInt))
        val winRate = rs.count(_ == 1).toDouble / probeIds.length
        f"""{"n_found":${rs.length},"mean":${rs.sum.toDouble / rs.length}%.2f,""" +
          f""""p50":${q(0.5)},"p90":${q(0.9)},"max":${rs.last},"rank1_rate":$winRate%.4f}"""
      }
    }
    val premise =
      s""""rank_dist":{"lexical":{"X":${rankOf(lexC, "lex_rank", 0)},"S":${rankOf(lexC, "lex_rank", 1)},""" +
        s""""T":${rankOf(lexC, "lex_rank", 2)}},""" +
        s""""semantic":{"X":${rankOf(semC, "sem_rank", 0)},"S":${rankOf(semC, "sem_rank", 1)},""" +
        s""""T":${rankOf(semC, "sem_rank", 2)}},""" +
        s""""fused":{"X":${rankOf(fusedC, "rank", 0)},"S":${rankOf(fusedC, "rank", 1)},""" +
        s""""T":${rankOf(fusedC, "rank", 2)}}}"""

    val json =
      s"""{"dir":"${Bench.esc(dir)}","probes":${probeIds.length},"k":$FusionTopK,""" +
        s""""probe_ids":[${probeIds.mkString(",")}],""" +
        s""""systems":{${sysJson("lexical", lexC, "lex_rank")},${sysJson("semantic", semC, "sem_rank")},""" +
        s"""${sysJson("fused", fusedC, "rank")}},$premise}"""
    val outFile = sys.env.getOrElse(
      "SPARK_GRAFT_FUSION_OUT",
      s"/tmp/r15/fusion_${new java.io.File(dir).getName}.json"
    )
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable => System.err.println(s"[fusion] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }

  private def pairsDF(spark: org.apache.spark.sql.SparkSession, pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("query_id", "doc_id")
  }
}
