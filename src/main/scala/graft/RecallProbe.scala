package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.queries.DedupSimQueries
import graft.sources.Tables

/** MEASURE q34's banded recall — including the production-regime
  * high-cosine bands — against an exact brute-force truth over a
  * derived corpus that now PLANTS controlled-cosine duplicate
  * families (ScaleUp round 14). The r13 certification proved the
  * multi-table union law R(c) = 1-(1-q^m)^L band-by-band, but the
  * corpus held only 2 true pairs above cosine 0.7, so the flagship
  * R(0.9)/R(0.95) claims were law extrapolations; with
  * ScaleUp.PlantCosines the 0.85/0.90/0.95 bands carry ≥10³ true
  * pairs from 100× up and the claims become measured numbers.
  *
  * Phases:
  *   1. q34 at the dir's own corpus-scaled geometry (the query as
  *      shipped — the probe re-derives nothing).
  *   2. Exact label-blocked brute-force truth ≥ τ via a SALTED
  *      self-join (the r13 lesson: ~10 labels cap the natural join at
  *      10 tasks — one two-block partition ran 70 min; salting the
  *      b-side into [[SaltGroups]] id-groups ran the identical truth
  *      in 15.7 s). Identical normalization + graft_dot arithmetic to
  *      q34, so the τ boundary cannot disagree between engine and
  *      truth.
  *   3. Per-band recall vs the law at the band's mean true cosine,
  *      and precision (every q34 pair must appear in the truth —
  *      inline scoring makes anything else a bug).
  *   4. PLANTED-pair recall per target cosine — the measured
  *      R(0.85)/R(0.90)/R(0.95), with the binomial 2σ envelope around
  *      the law's prediction.
  *   5. (unless SPARK_GRAFT_RECALL_Q129=0) the same planted truth
  *      graded against the SemDeDup path: co-cluster rate under the
  *      persisted cell partition and q129's catch rate (partner
  *      dropped) — the cell-exact route's high-cosine recall beside
  *      the LSH route's.
  *
  * Usage: sbt "runMain graft.RecallProbe [derivedDir]"
  *   output: one JSON line + SPARK_GRAFT_RECALL_OUT
  *   (default /tmp/r14/recall_<basename>.json)
  */
object RecallProbe {

  val SaltGroups = 32

  /** The multi-table union recall law at true cosine c (m planes per
    * table, L tables): collision prob per plane q = 1 - arccos(c)/π.
    */
  def law(c: Double, m: Int, l: Int): Double =
    1.0 - math.pow(1.0 - math.pow(1.0 - math.acos(c) / math.Pi, m), l)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf100-derived")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runQ129 = !sys.env.get("SPARK_GRAFT_RECALL_Q129").contains("0")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    import DedupSimQueries.{embPlanesFor, embTablesFor, CosineThreshold, Dims}

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val m = embPlanesFor(n)
    val lTables = embTablesFor(n) // corpus-scaled since r15: L(m) holds R(0.90) >= 0.9

    // 1. the operator under test, exactly as shipped
    val (q34, q34Sec) = timed {
      DedupSimQueries
        .queries("q34_dedup_embedding")(spark, dir)
        .select(col("vec_a"), col("vec_b"))
        .localCheckpoint()
    }
    val nQ34 = q34.count()

    // 2+3. exact truth + banded recall + precision — SKIPPED under
    // SPARK_GRAFT_RECALL_PLANTED_ONLY=1 (the 512×/1024× contract-table
    // points: planted pairs are known BY CONSTRUCTION, so recall at
    // the operating cosines needs no O(N²/labels) exact truth; the
    // full-truth run at 100×/256× keeps certifying precision and the
    // non-planted bands).
    val plantedOnly = sys.env.get("SPARK_GRAFT_RECALL_PLANTED_ONLY").contains("1")
    val (truthSec, nTruth, bands, falsePairs, precision) =
      if (plantedOnly) (0.0, -1L, "", -1L, -1.0)
      else {
        val e = emb.select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
        val nrm =
          Dedup.withNormalized(e, "v").select(col("vec_id"), col("label"), col("nv")).localCheckpoint()
        val a = nrm.select(col("vec_id").as("vec_a"), col("label"), col("nv").as("nv_a"))
          .withColumn("g", explode(sequence(lit(0), lit(SaltGroups - 1))))
        val b = nrm.select(
          col("vec_id").as("vec_b"),
          col("label"),
          col("nv").as("nv_b"),
          pmod(col("vec_id"), lit(SaltGroups.toLong)).cast("int").as("g")
        )
        val (truth, tSec) = timed {
          a.join(b, Seq("label", "g"))
            .filter(col("vec_a") < col("vec_b"))
            .withColumn("cosine", GraftFunctions.dot(col("nv_a"), col("nv_b")))
            .filter(col("cosine") >= CosineThreshold)
            .select(col("vec_a"), col("vec_b"), col("cosine"))
            .localCheckpoint()
        }
        val nT0 = truth.count()
        // band edges keep the planted cosines mid-band (float32
        // storage jitter ~1e-6 must not split a family across an edge)
        val edges = Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.875, 0.925, 1.0000001)
        val bandExpr = edges.init.zip(edges.tail).zipWithIndex.foldLeft(lit(null).cast("string")) {
          case (acc, ((lo, hi), _)) =>
            when(col("cosine") >= lo && col("cosine") < hi, lit(f"$lo%.3f-$hi%.3f")).otherwise(acc)
        }
        val joined = truth
          .join(q34.withColumn("found", lit(1)), Seq("vec_a", "vec_b"), "left_outer")
          .withColumn("band", bandExpr)
          .localCheckpoint()
        val bandsJson = joined
          .groupBy(col("band"))
          .agg(
            count(lit(1)).as("n_true"),
            sum(coalesce(col("found"), lit(0))).as("n_found"),
            avg(col("cosine")).as("mean_cos")
          )
          .orderBy(col("band"))
          .collect()
          .map { r =>
            val (nT, nF, mc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
            val rec = if (nT > 0) nF.toDouble / nT else 0.0
            s""""${r.getString(0)}":{"n_true":$nT,"n_found":$nF,"recall":${f"$rec%.4f"},""" +
              s""""mean_cos":${f"$mc%.4f"},"law_predicted":${f"${law(mc, m, lTables)}%.4f"}}"""
          }
          .mkString(",")
        // inline scoring ⇒ every emitted pair is a real τ-pair;
        // anything outside the truth is a probe/operator disagreement
        val fp = q34.join(truth, Seq("vec_a", "vec_b"), "left_anti").count()
        val prec = if (nQ34 > 0) (nQ34 - fp).toDouble / nQ34 else 1.0
        (tSec, nT0, bandsJson, fp, prec)
      }

    // 4. planted-pair recall at the known target cosines — the
    // CLASSIC slice only (residues < PlantCosines.length); the r15
    // cross-modal families (residues 3..5) have their own FusionProbe
    // eval and would otherwise contaminate the 0.90 bucket
    val partner = emb
      .select(col("vec_id"))
      .filter(
        pmod(col("vec_id"), lit(ScaleUp.KeyStride)) >= ScaleUp.PlantOffset &&
          pmod(pmod(col("vec_id"), lit(ScaleUp.KeyStride)) - ScaleUp.PlantOffset, lit(ScaleUp.PlantMod)) <
          ScaleUp.PlantCosines.length
      )
      .withColumn("vec_a", col("vec_id") - ScaleUp.PlantOffset)
      .withColumn(
        "c_target",
        element_at(
          array(ScaleUp.PlantCosines.map(lit): _*),
          (pmod(pmod(col("vec_id"), lit(ScaleUp.KeyStride)) - ScaleUp.PlantOffset, lit(ScaleUp.PlantMod)) + 1)
            .cast("int")
        )
      )
      .select(col("vec_a"), col("vec_id").as("vec_b"), col("c_target"))
      .localCheckpoint()
    val plantedRows = partner
      .join(q34.withColumn("found", lit(1)), Seq("vec_a", "vec_b"), "left_outer")
      .groupBy(col("c_target"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("found"), lit(0))).as("n_found"))
      .orderBy(col("c_target"))
      .collect()
    val planted = plantedRows
      .map { r =>
        val (c, nP, nF) = (r.getDouble(0), r.getLong(1), r.getLong(2))
        val rec = if (nP > 0) nF.toDouble / nP else 0.0
        val pred = law(c, m, lTables)
        val se = math.sqrt(math.max(pred * (1 - pred), 1e-12) / math.max(nP, 1L))
        val within = math.abs(rec - pred) <= 2 * se + 1e-9
        s""""${f"$c%.2f"}":{"n_true":$nP,"n_found":$nF,"recall":${f"$rec%.4f"},""" +
          s""""law_predicted":${f"$pred%.4f"},"two_se":${f"${2 * se}%.4f"},"within_2se":$within}"""
      }
      .mkString(",")

    // 5. the SemDeDup route over the same planted truth: primary
    // co-location (the r14 ceiling), probe co-location (share ANY
    // probe cell — what the r15 multi-probe pair search can reach),
    // and q129's catch rate (partner actually dropped, including via
    // third vectors)
    val q129Json =
      if (!runQ129) """"skipped""""
      else {
        val (idxP, cellSec) = timed {
          DedupSimQueries
            .cellIndexEnsure(spark, dir)
            .select(col("vec_id"), col("probe"), col("cluster"))
            .localCheckpoint()
        }
        val idx = idxP.filter(col("probe") === 1)
        val (q129, q129Sec) = timed {
          DedupSimQueries
            .queries("q129_semantic_dedup")(spark, dir)
            .select(col("vec_id"), col("kept"))
            .localCheckpoint()
        }
        val probeShared = partner
          .join(idxP.select(col("vec_id").as("vec_a"), col("cluster").as("pc")), Seq("vec_a"))
          .join(idxP.select(col("vec_id").as("vec_b"), col("cluster").as("pc")), Seq("vec_b", "pc"))
          .select(col("vec_a"), col("vec_b"))
          .distinct()
          .withColumn("pshared", lit(1))
        val rows = partner
          .join(idx.select(col("vec_id").as("vec_a"), col("cluster").as("cl_a")), Seq("vec_a"))
          .join(idx.select(col("vec_id").as("vec_b"), col("cluster").as("cl_b")), Seq("vec_b"))
          .join(q129.select(col("vec_id").as("vec_b"), col("kept")), Seq("vec_b"))
          .join(probeShared, Seq("vec_a", "vec_b"), "left_outer")
          .groupBy(col("c_target"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("cl_a") === col("cl_b"), 1).otherwise(0)).as("n_cocluster"),
            sum(coalesce(col("pshared"), lit(0))).as("n_probe_shared"),
            sum(when(!col("kept"), 1).otherwise(0)).as("n_caught")
          )
          .orderBy(col("c_target"))
          .collect()
          .map { r =>
            val (c, nP, nCo, nPs, nC) =
              (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
            s""""${f"$c%.2f"}":{"n_true":$nP,"cocluster_rate":${f"${nCo.toDouble / math.max(nP, 1L)}%.4f"},""" +
              s""""probe_shared_rate":${f"${nPs.toDouble / math.max(nP, 1L)}%.4f"},""" +
              s""""catch_rate":${f"${nC.toDouble / math.max(nP, 1L)}%.4f"}}"""
          }
          .mkString(",")
        s"""{"cell_build_sec":${f"$cellSec%.3f"},"q129_sec":${f"$q129Sec%.3f"},""" +
          s""""probes":${graft.operators.CellIndex.ProbeCount},"by_cosine":{$rows}}"""
      }

    // 5b. (optional, SPARK_GRAFT_RECALL_PSWEEP="2,3") the PROBE-COUNT
    // contract sweep (r15 verdict #4): under the SAME frozen geometry
    // (persisted cents — no retraining), assign the corpus at each
    // probe count P and measure what another probe buys (catch +
    // probe-shared coverage per planted cosine) and what it costs
    // (within-cell pair candidates per vector — the quantity bounded
    // by P²·occupancy). P=2 reproduces the shipped index's assignment
    // bit-for-bit, so its row doubles as an in-memory/persisted
    // cross-check against section 5.
    val psweepJson = sys.env
      .get("SPARK_GRAFT_RECALL_PSWEEP")
      .filter(_ => runQ129)
      .map { spec =>
        import DedupSimQueries.{SemDedupTauDen, SemDedupTauNum}
        val table = DedupSimQueries.cellIndexTable(dir)
        val cents = spark.table(s"${table}_cents").localCheckpoint()
        val fine = cents.filter(col("level") === "fine").select(col("cid"), col("cell"), col("ca"))
        val coarse = cents.filter(col("level") === "coarse").select(col("cid"), col("ca"))
        val q = graft.operators.KMeans.quantizeShifted(emb, "vec_id", "embedding").localCheckpoint()
        val entries = spec.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).map { p =>
          val (asg, asgSec) = timed {
            graft.operators.KMeans
              .assignMultiProbe(q, fine, coarse, Dims, p)
              .localCheckpoint()
          }
          val nAsg = asg.count()
          val candRow = asg
            .groupBy(col("cluster"))
            .agg(count(lit(1)).as("m"))
            .agg(sum(expr("m * (m - 1) div 2")))
            .head()
          val candPerVec = (if (candRow.isNullAt(0)) 0L else candRow.getLong(0)).toDouble / math.max(n, 1L)
          val idxp = asg.select(col("vec_id"), col("cluster"))
          val pshared = partner
            .join(idxp.select(col("vec_id").as("vec_a"), col("cluster").as("pc")), Seq("vec_a"))
            .join(idxp.select(col("vec_id").as("vec_b"), col("cluster").as("pc")), Seq("vec_b", "pc"))
            .select(col("vec_a"), col("vec_b"))
            .distinct()
            .withColumn("pshared", lit(1))
          val (kept, dedupSec) = timed {
            graft.dedup.DedupPipeline
              .semDedup(asg, Dims, SemDedupTauNum, SemDedupTauDen)
              .select(col("vec_id"), col("kept"))
              .localCheckpoint()
          }
          val rows = partner
            .join(kept.select(col("vec_id").as("vec_b"), col("kept")), Seq("vec_b"))
            .join(pshared, Seq("vec_a", "vec_b"), "left_outer")
            .groupBy(col("c_target"))
            .agg(
              count(lit(1)).as("n"),
              sum(coalesce(col("pshared"), lit(0))).as("n_ps"),
              sum(when(!col("kept"), 1).otherwise(0)).as("n_caught")
            )
            .orderBy(col("c_target"))
            .collect()
            .map { r =>
              val (c, nP, nPs, nC) = (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))
              s""""${f"$c%.2f"}":{"n_true":$nP,"probe_shared_rate":${f"${nPs.toDouble / math.max(nP, 1L)}%.4f"},""" +
                s""""catch_rate":${f"${nC.toDouble / math.max(nP, 1L)}%.4f"}}"""
            }
            .mkString(",")
          s"""{"probes":$p,"n_probe_rows":$nAsg,"assign_sec":${f"$asgSec%.3f"},"dedup_sec":${f"$dedupSec%.3f"},""" +
            s""""candidates_per_vector":${f"$candPerVec%.2f"},"by_cosine":{$rows}}"""
        }
        s""","probe_sweep":[${entries.mkString(",")}]"""
      }
      .getOrElse("")

    // 6. (optional, SPARK_GRAFT_RECALL_TARGET_MULT=m) the ceiling's
    // KNOB: co-location rises with cluster size, so price the trade —
    // build a second cell partition at m× the standard target and
    // measure the planted pairs' co-cluster rate under it. A pipeline
    // that needs more SemDeDup recall pays larger clusters (more
    // within-cluster dots: cost ∝ target per vector) instead of a new
    // algorithm; this records how much recall each step buys.
    val targetMultJson = sys.env.get("SPARK_GRAFT_RECALL_TARGET_MULT").map(_.toInt).map { mult =>
      import DedupSimQueries.{KmeansIters, KmeansK, SemClusterTarget}
      val t2 = s"graft_recall_probe_t$mult"
      graft.operators.CellIndex.drop(spark, t2)
      val (idx2, buildSec) = timed {
        graft.operators.CellIndex
          .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget * mult, KmeansIters, Dims, t2)
          .filter(col("probe") === 1)
          .select(col("vec_id"), col("cluster"))
          .localCheckpoint()
      }
      val rows = partner
        .join(idx2.select(col("vec_id").as("vec_a"), col("cluster").as("cl_a")), Seq("vec_a"))
        .join(idx2.select(col("vec_id").as("vec_b"), col("cluster").as("cl_b")), Seq("vec_b"))
        .groupBy(col("c_target"))
        .agg(count(lit(1)).as("n"), sum(when(col("cl_a") === col("cl_b"), 1).otherwise(0)).as("n_co"))
        .orderBy(col("c_target"))
        .collect()
        .map { r =>
          s""""${f"${r.getDouble(0)}%.2f"}":{"n_true":${r.getLong(1)},""" +
            s""""cocluster_rate":${f"${r.getLong(2).toDouble / math.max(r.getLong(1), 1L)}%.4f"}}"""
        }
        .mkString(",")
      graft.operators.CellIndex.drop(spark, t2)
      s""","cocluster_at_target_x$mult":{"target":${SemClusterTarget * mult},""" +
        s""""build_sec":${f"$buildSec%.3f"},"by_cosine":{$rows}}"""
    }.getOrElse("")

    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val json =
      s"""{"dir":"${Bench.esc(dir)}","n_vectors":$n,"planes_m":$m,"tables_L":$lTables,
         |"planted_only":$plantedOnly,
         |"tau":$CosineThreshold,"q34_sec":${r3(q34Sec)},"truth_sec":${r3(truthSec)},
         |"n_exact_pairs":$nTruth,"n_q34_pairs":$nQ34,
         |"false_pairs":$falsePairs,"precision":${f"$precision%.6f"},
         |"bands":{$bands},
         |"planted_recall":{$planted},
         |"semdedup_planted":$q129Json$psweepJson$targetMultJson}""".stripMargin.replace("\n", "")
    val outFile = sys.env.getOrElse(
      "SPARK_GRAFT_RECALL_OUT",
      s"/tmp/r14/recall_${new java.io.File(dir).getName}.json"
    )
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable => System.err.println(s"[recall] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
