package graft

import org.apache.spark.sql.functions._

import graft.operators.CellIndex
import graft.queries.DedupSimQueries
import graft.sources.Tables

/** The decade-boundary maintenance adjudication (r12 verdict #7):
  * prove the round-13 geometry hysteresis band survives the regime
  * that defeated the pre-r13 ensure() — a corpus built at one decade
  * and grown toward the next by frozen-geometry appends, crossing
  * MANY k-steps (at 100x→128x: n goes 200k→256k, so the re-derived
  * k = n/64 would step 3125→4000, i.e. 875 steps — before the band,
  * EVERY one of those steps handed the next consumer a full corpus
  * re-train).
  *
  * Phases timed (one JSON line + file at SPARK_GRAFT_DECADE_OUT):
  *   - `build_base_sec`: ensure() over the base (100x) id-range —
  *     the ingest training.
  *   - `append_sec`: the 28%-growth batch appended under the frozen
  *     geometry (the per-ingest-batch steady-state cost).
  *   - `content_validate_sec`: the next fresh session's ensure() over
  *     the grown corpus — the append cleared the source anchor, so
  *     this pays ONE content fingerprint; it must NOT rebuild (the
  *     stored k sits inside the band: 256k/3125 = 81.9 ≤ 2·64).
  *   - `metadata_only_sec`: the session after that — the successful
  *     validation re-anchored the bare-scan listing, so this is the
  *     steady-state zero-scan read.
  *   - `rebuild_sec`: drop + ensure() over the full corpus — what the
  *     pre-r13 exact-geometry check forced at every k-step, priced
  *     beside the append so the band's savings is a recorded number.
  *   - `consumer_maintained_sec` / `consumer_rebuilt_sec`: a standing
  *     consumer (q133 kNN classify) off the maintained index vs the
  *     re-trained one — both are VALID geometries (the band's
  *     contract); their costs should agree.
  *
  * Also recorded: the stored geometry before/after (must be UNCHANGED
  * by in-band appends), fingerprint-scan counts proving the metadata
  * path, occupancy stats, and the q142 monitor's verdict at the
  * default 2x factor (max-occupancy may legitimately flag while the
  * mean-band still serves — that split IS the designed cadence: the
  * monitor owns the retrain decision, ensure() stays cheap).
  *
  * Usage: sbt "runMain graft.CellDecadeProbe <fullDir> <baseReplicas>"
  *   e.g. CellDecadeProbe target/sf128-derived 100  (ScaleUp replica
  *   i's keys shift by i·KeyStride, so the base corpus is the
  *   vec_id < baseReplicas·KeyStride prefix — byte-identical to the
  *   sf100-derived run's rows).
  */
object CellDecadeProbe {
  def main(args: Array[String]): Unit = {
    val fullDir = args.headOption.getOrElse("/root/repo/target/sf128-derived")
    val baseReplicas = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    import DedupSimQueries.{Dims, KmeansIters, KmeansK, SemClusterTarget}

    val emb = Tables.embeddings(spark, fullDir)
    val cut = ScaleUp.KeyStride * baseReplicas
    val base = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    val T = DedupSimQueries.cellIndexTable(fullDir)
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def geom: String = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(T))
      .properties(CellIndex.GeomProp)
    def ens(df: org.apache.spark.sql.DataFrame): Unit = {
      CellIndex.ensure(df, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, T)
      ()
    }

    CellIndex.drop(spark, T)
    val buildBase = timed(ens(base))
    val geomBase = geom
    val appendSec = timed(CellIndex.append(batch, "vec_id", "embedding", Some("label"), T))
    // fresh session #1: content validation (anchor cleared), NO rebuild
    CellIndex.invalidateMemo(T)
    val scans0 = CellIndex.fingerprintScans.get()
    val contentValidate = timed(ens(emb))
    val geomAfterAppend = geom
    val scansContent = CellIndex.fingerprintScans.get() - scans0
    // fresh session #2: metadata-only off the re-anchored listing
    CellIndex.invalidateMemo(T)
    val metadataOnly = timed(ens(emb))
    val scansMeta = CellIndex.fingerprintScans.get() - scans0 - scansContent
    // occupancy + the monitor's verdict at the default calibration
    val occ = CellIndex
      .readPrimary(spark, T)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), avg(col("n")).as("mean"), count(lit(1)).as("k"))
      .head()
    val (maxOcc, meanOcc, liveK) = (occ.getLong(0), occ.getDouble(1), occ.getLong(2))
    // a standing consumer off the maintained (frozen-appended) index
    val consumerMaintained = timed {
      DedupSimQueries.queries("q133_knn_classify")(spark, fullDir).write.format("noop").mode("overwrite").save()
    }
    val monitorVerdict = maxOcc.toDouble > 2.0 * SemClusterTarget
    // the alternative the pre-r13 ensure() forced at every k-step
    CellIndex.drop(spark, T)
    val rebuild = timed(ens(emb))
    val geomRebuilt = geom
    val consumerRebuilt = timed {
      DedupSimQueries.queries("q133_knn_classify")(spark, fullDir).write.format("noop").mode("overwrite").save()
    }
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val json =
      s"""{"full_dir":"${Bench.esc(fullDir)}","base_replicas":$baseReplicas,
         |"n_base":${base.count()},"n_full":${emb.count()},
         |"geom_base":"${Bench.esc(geomBase)}","geom_after_append":"${Bench.esc(geomAfterAppend)}","geom_rebuilt":"${Bench.esc(geomRebuilt)}",
         |"in_band_no_retrain":${geomBase == geomAfterAppend},
         |"content_validate_scans":$scansContent,"metadata_only_scans":$scansMeta,
         |"build_base_sec":${r3(buildBase)},"append_sec":${r3(appendSec)},
         |"content_validate_sec":${r3(contentValidate)},"metadata_only_sec":${r3(metadataOnly)},
         |"rebuild_sec":${r3(rebuild)},
         |"consumer_maintained_sec":${r3(consumerMaintained)},"consumer_rebuilt_sec":${r3(consumerRebuilt)},
         |"live_k":$liveK,"max_occupancy":$maxOcc,"mean_occupancy":${r3(meanOcc)},
         |"monitor_would_retrain_at_2x":$monitorVerdict}""".stripMargin.replace("\n", "")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_DECADE_OUT", "/tmp/r13/cell_decade.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    catch { case e: Throwable => System.err.println(s"[decade] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
