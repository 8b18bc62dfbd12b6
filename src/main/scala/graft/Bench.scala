package graft

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line.
  *
  * Execution is a noop-format write, NOT count(): Catalyst prunes
  * unused projections under a count, so narrow scalar queries would be
  * timed as scan-only (round-1 bug — fingerprint/regex work never
  * ran). The noop sink materializes every output column.
  *
  * SELF-STABILIZING (round 8): every query runs in TWO full passes
  * and reports the per-query MINIMUM. Single-pass numbers on a
  * 32-thread shared JVM showed phantom 3-7× "regressions"
  * (scheduling/GC/JIT noise landing on whichever query drew the short
  * straw — r7's q75/q76/q46/q97 all vanished on re-run), which made
  * every round's bench artifact cry wolf. The min of two spaced
  * passes is the right estimator for "what does this plan cost":
  * noise is strictly additive, and a full second sweep (rather than
  * back-to-back repeats) lets JIT/GC reach steady state while still
  * timing each query's own plan compilation in pass 1. Both passes
  * are emitted (`queries_pass1`/`queries_pass2`) so run-to-run
  * agreement is itself visible in the artifact.
  *
  * Failures are reported as failures (in a `failed` object, excluded
  * from `queries`/total) — a broken query must not look fast.
  */
object Bench {

  /** Minimal JSON string escaping for the hand-built artifact lines
    * (shared with CellDecadeProbe — r13 advice: an interpolated path
    * containing a quote/backslash made the probe's line unparseable).
    */
  def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => " "
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    // the production session factory — Bench/Verify/Profile must all
    // measure the SAME configuration users run
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/scan init otherwise lands entirely on
    // the alphabetically-first query and distorts its number. Scans
    // warm the parquet reader + each table's footer/codec path; the
    // QUERIES still run cold (their plan compilation is part of the
    // measurement).
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // tolerate subset corpora ONLY when the run is declared restricted
    // (SPARK_GRAFT_SCALE_TABLES subset generations / SPARK_GRAFT_BENCH_ONLY
    // sweeps) — in a full sweep a missing/corrupt table is a setup error
    // that must fail HERE, not surface as cold I/O inside the first
    // measured query that touches it (r16 ADVICE)
    val restricted = sys.env.contains("SPARK_GRAFT_SCALE_TABLES") || sys.env.contains("SPARK_GRAFT_BENCH_ONLY")
    graft.sources.Tables.All.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
      catch {
        case e: org.apache.spark.sql.AnalysisException if restricted =>
          System.err.println(s"[bench] WARMUP SKIPPED for missing table $t (restricted run): ${e.getMessage.linesIterator.next()}")
      }
    }
    // SPARK_GRAFT_BENCH_ONLY=q97_link_pagerank,q31_... restricts the
    // sweep (the sf1 scaling runs time only the top-10 most expensive
    // queries; the driver leaves it unset)
    val only = sys.env
      .get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    // Price the one-off cell-partition training as its OWN entry (the
    // shared persisted CellIndex that q82/q129/q133/q138/q142 read):
    // a warm warehouse + min-of-passes otherwise hides the build cost
    // entirely — the table survives across runs and only the first
    // consumer's pass-1 ever paid it. Dropping the table first makes
    // the number deterministic (train + bucketed write + stamps), and
    // the sweep's consumers then read the warm index in BOTH passes,
    // so their rows are purely the read path. Skippable for derived-SF
    // sweeps that restrict to non-cell queries.
    // auto-skip when the (restricted) sweep contains no consumer of
    // the shared cell index — a derived-SF run timing only non-cell
    // queries shouldn't pay (or need an extra env var to avoid) a
    // training run nothing will read. SPARK_GRAFT_BENCH_CELL_BUILD=1
    // forces the build anyway, =0 forces the skip.
    val cellConsumerNames = Set(
      "q82_knn_join",
      "q129_semantic_dedup",
      "q133_knn_classify",
      "q138_dedup_pipeline",
      "q142_cell_occupancy"
    )
    val cellBuildSec: Option[Double] =
      if (sys.env.get("SPARK_GRAFT_BENCH_CELL_BUILD").contains("0")) None
      else if (!sys.env.get("SPARK_GRAFT_BENCH_CELL_BUILD").contains("1") && !names.exists(cellConsumerNames)) None
      else {
        graft.queries.DedupSimQueries.cellIndexDrop(spark, sfDir)
        val t0 = System.nanoTime()
        graft.queries.DedupSimQueries.cellIndexEnsure(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      }
    val passTimes = Array.fill(passes)(scala.collection.mutable.LinkedHashMap[String, Double]())
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query resource telemetry (round 11 — the spill-vs-algorithm
    // adjudication the scaling artifact needs): task-level
    // memory/disk spill sums and the max per-task peak execution
    // memory, accumulated by a listener and snapshotted around each
    // query. The listener bus is asynchronous; the short drain sleep
    // bounds attribution error to ms-scale stragglers (telemetry, not
    // a gate).
    val memSpilled = new java.util.concurrent.atomic.AtomicLong
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          peakMem.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })
    case class Resources(memSpill: Long, diskSpill: Long, peakMem: Long)
    val resources = scala.collection.mutable.LinkedHashMap[String, Resources]()
    // SPARK_GRAFT_OBSERVE=1 turns on the pair-engine volume points
    // (candidates/survivors/output row counts per query — the numbers
    // that grade scaling when wall-clock is era-noise-bound). Off by
    // default: the CollectMetrics nodes are absent and the timed plans
    // are byte-identical to production.
    if (Volumes.isEnabled) Volumes.enable(spark)
    val volumes = scala.collection.mutable.LinkedHashMap[String, Map[String, Long]]()
    // per-pass Janino wall (CodeGenerator.compileTime, ns): the
    // mechanism telemetry behind spark.sql.codegen.cache.maxEntries —
    // with a working cache pass 2's compile time collapses toward 0;
    // with the 100-entry default it re-pays pass 1's bill (r20).
    val codegenCompileSec = Array.fill(passes)(0.0)
    for (p <- 0 until passes) {
    val ct0 = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compileTime
    for (name <- names if !failed.contains(name)) {
      val fn = SparkEntry.queries(name)
      if (Volumes.isEnabled) Volumes.reset()
      val t0 = System.nanoTime()
      val (m0, d0) = (memSpilled.get(), diskSpilled.get())
      peakMem.set(0L)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        passTimes(p)(name) = (System.nanoTime() - t0) / 1e9
        // deterministic drain of this query's task events (replaces a
        // fixed 150 ms sleep whose stragglers bled into the next row)
        org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)
        if (Volumes.isEnabled) {
          // deterministic counts: pass-2 == pass-1; a point evaluated
          // more than once in the query surfaces as <point>__evals so
          // the artifact shows the attribution ambiguity (r14 advice)
          val vols = Volumes.snapshot ++
            Volumes.multiplicity.map { case (p, n) => s"${p}__evals" -> n.toLong }
          if (vols.nonEmpty) volumes(name) = vols
        }
        val r = Resources(memSpilled.get() - m0, diskSpilled.get() - d0, peakMem.get())
        // keep the pass with the larger spill — the honest resource
        // footprint (min-time passes can ride caches the first filled)
        if (!resources.get(name).exists(o => o.diskSpill + o.memSpill >= r.diskSpill + r.memSpill))
          resources(name) = r
      } catch {
        case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
          System.err.println(s"[bench] $name FAILED: ${failed(name)}")
      }
    }
    codegenCompileSec(p) =
      (org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compileTime - ct0) / 1e9
    System.err.println(f"[bench] pass ${p + 1} codegen compile wall: ${codegenCompileSec(p)}%.1f s")
    }
    // r13 verdict #5: the headline rows for the index-builder queries
    // are honest build+append+query TOTALS, which lets host wobble on
    // one number masquerade as a plan regression until a separate
    // INDEX_COSTS run adjudicates it (q117's ×1.62 in r13). Emit the
    // per-family phase split into THIS artifact (one pass — the
    // totals above stay the min-of-passes continuity numbers; the
    // standalone IndexCosts main remains the min-of-2 deep probe).
    // Default on for full sweeps, off for restricted ones
    // (SPARK_GRAFT_BENCH_PHASES=1/0 forces).
    val phasesWanted = sys.env.get("SPARK_GRAFT_BENCH_PHASES") match {
      case Some("0") => false
      case Some("1") => true
      case _ => only.isEmpty
    }
    val phaseSplits: Seq[(String, IndexCosts.Phases)] =
      if (!phasesWanted) Nil
      else
        IndexCosts.phaseRunners(spark, sfDir).map { case (n, run) =>
          n -> (try run()
          catch { case e: Throwable => System.err.println(s"[bench] phases $n FAILED: ${e.getMessage}"); IndexCosts.Phases(-1, -1, -1) })
        }
    // a query that failed in ANY pass is a failure, not a timing
    failed.keys.foreach(n => passTimes.foreach(_.remove(n)))
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.filterNot(failed.contains).foreach { n =>
      timings(n) = passTimes.flatMap(_.get(n)).min
    }
    // millisecond precision: full doubles would bloat the line ~2×
    // and push more of the authoritative tail out of the driver's
    // 2000-char capture window
    def obj(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => s""""${esc(k)}":${math.round(v * 1000) / 1000.0}""" }.mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val passObjs = passTimes.zipWithIndex
      .map { case (m, i) => s""""queries_pass${i + 1}":${obj(m)}""" }
      .mkString(",")
    // these queries rebuild their persisted index/table (version-
    // stamped warehouse state; append ≡ rebuild is spec-asserted)
    // INSIDE the timed query in EVERY pass — their numbers are honest
    // build+query totals, one thing in both passes, not query-only
    val indexBuilders = Seq(
      "q85_incremental_dedup",
      "q87_bucketed_index_dedup",
      "q104_pagerank_delta",
      "q107_ann_ivf_index",
      "q117_bm25_index",
      "q125_ivfpq_topk"
    ).filter(timings.contains)
    val ib = indexBuilders.map(n => s""""${esc(n)}"""").mkString("[", ",", "]")
    // these queries READ the shared persisted cell partition, built
    // ONCE before the sweep and priced as cell_index_build_sec above —
    // every consumer row (the list is lexicographically sorted, so
    // q129 executes first in the sweep) is purely the read-path cost
    val cellConsumers = cellConsumerNames.toSeq.sorted.filter(timings.contains)
    val cc = cellConsumers.map(n => s""""${esc(n)}"""").mkString("[", ",", "]")
    // THE WHOLE ARTIFACT GOES TO A FILE (round 11): the driver's
    // stdout capture window is ~2000 chars, and 141 queries × ~28
    // chars can never fit it — BENCH_r10 lost the per-query numbers
    // for q100-q141 (alphabetically EARLY: "q100" < "q10_") to the
    // tail truncation. The file is the authoritative record the next
    // round's judge diffs; the driver's end-of-round commit picks it
    // up. Override the location with SPARK_GRAFT_BENCH_OUT (the
    // scaling sweeps do, so derived-SF runs don't clobber the sf0.1
    // record).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_QUERIES.json")
    val cellField = cellBuildSec.map(s => s""""cell_index_build_sec":${math.round(s * 1000) / 1000.0},""").getOrElse("")
    val fileJson =
      s"""{"metric":"total","unit":"sec","passes":$passes,"sf":"$sfDir",
         |"failed":$fs,"n_failed":${failed.size},
         |"includes_index_build":$ib,
         |"uses_shared_cell_index":$cc,
         |$cellField
         |$passObjs,
         |"resources":${resources
          .filterNot { case (n, _) => failed.contains(n) }
          .map { case (n, r) =>
            s""""${esc(n)}":{"mem_spill":${r.memSpill},"disk_spill":${r.diskSpill},"peak_exec_mem":${r.peakMem}}"""
          }
          .mkString("{", ",", "}")},
         |"index_phases":${phaseSplits
          .map { case (n, p) =>
            def r3(v: Double): Double = math.round(v * 1000) / 1000.0
            val cf = if (p.compact >= 0) s""","compact_sec":${r3(p.compact)}""" else ""
            s""""${esc(n)}":{"rebuild_sec":${r3(p.rebuild)},"append_sec":${r3(p.append)},"query_sec":${r3(p.query)}$cf}"""
          }
          .mkString("{", ",", "}")},
         |"volumes":${volumes
          .filterNot { case (n, _) => failed.contains(n) }
          .map { case (n, vs) =>
            s""""${esc(n)}":${vs.toSeq.sorted.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")}"""
          }
          .mkString("{", ",", "}")},
         |"codegen_compile_sec":${codegenCompileSec.map(s => math.round(s * 1000) / 1000.0).mkString("[", ",", "]")},
         |"queries":${obj(timings)},
         |"value":$total}""".stripMargin
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fileJson)
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    // stdout stays the ONE-line contract, now SUMMARY-ONLY (round 12):
    // 142 per-query numbers can never fit the driver's ~2000-char
    // capture window, and a truncated line is unparseable JSON — r10's
    // reverse-sort trick kept the interesting keys visible but left
    // the WHOLE-line parse broken (BENCH_r11 "parsed": null). Every
    // per-query map lives in the per_query_file artifact; the line
    // carries what a parser needs: total, failures, sf, the pointer,
    // and the separately-priced cell-index build.
    println(
      s"""{"metric":"total","unit":"sec","value":${math.round(total * 1000) / 1000.0},"sf":"$sfDir","passes":$passes,"n_queries":${timings.size},"n_failed":${failed.size},"failed":$fs,$cellField"per_query_file":"${esc(outFile)}"}"""
    )
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
