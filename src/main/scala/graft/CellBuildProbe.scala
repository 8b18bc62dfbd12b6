package graft

import org.apache.spark.sql.functions._

import graft.operators.CellIndex
import graft.queries.DedupSimQueries
import graft.sources.Tables

/** Adjudicate the cell-index BUILD cost at a decade (r14 verdict #4:
  * `cell_index_build_sec` jumped 112 s → 503 s from 512× to 1024×, a
  * 4.5× step for 2× data where N·√k growth predicts ~2.8× — the one
  * super-linear-looking number in SCALING_r14 that never got a
  * decomposition or an era control). This probe runs a SOLO fresh-JVM
  * build and splits it into its materialization phases (quantize /
  * coarse Lloyd / fine-seed assign / coarse assign / fine rounds /
  * multi-probe assign+bucketed write / centroid write), attributing
  * per-phase wall-clock, task spill, and peak execution memory via a
  * listener snapshotted at each phase tick — the q118 treatment: if
  * the jump is one phase going heap-bound, the phase split names it;
  * if every phase scales ~N·√k and the total is era noise, the solo
  * control shows that instead.
  *
  * Usage: sbt "runMain graft.CellBuildProbe [derivedDir]"
  *   output: one JSON line + SPARK_GRAFT_BUILD_OUT
  *   (default /tmp/r15/cellbuild_<basename>.json)
  */
object CellBuildProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1024-derived")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

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

    val emb = Tables.embeddings(spark, dir)
    // warm the scan (footers/codecs), as Bench does — the phases must
    // measure the BUILD, not first-touch I/O init
    emb.write.format("noop").mode("overwrite").save()

    val T = "graft_build_probe_idx"
    CellIndex.drop(spark, T)
    import DedupSimQueries.{Dims, KmeansIters, SemClusterTarget}
    val fp = CellIndex.fingerprintOf(emb, "vec_id", "embedding")
    val k = math.max(DedupSimQueries.KmeansK, (fp.n / SemClusterTarget).toInt)

    case class Snap(t: Long, mem: Long, disk: Long)
    val phases = scala.collection.mutable.ArrayBuffer[(String, Double, Long, Long, Long)]()
    var last = Snap(System.nanoTime(), memSpilled.get(), diskSpilled.get())
    def tick(name: String): Unit = {
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)
      val now = Snap(System.nanoTime(), memSpilled.get(), diskSpilled.get())
      phases += ((name, (now.t - last.t) / 1e9, now.mem - last.mem, now.disk - last.disk, peakMem.get()))
      peakMem.set(0L)
      last = now
    }

    val t0 = System.nanoTime()
    // reset the clock AFTER the fingerprint (ensure() pays it on the
    // content path; the r14 number under adjudication is the drop +
    // ensure total, so the fingerprint is timed as its own phase)
    last = Snap(System.nanoTime(), memSpilled.get(), diskSpilled.get())
    CellIndex.build(
      emb, "vec_id", "embedding", Some("label"),
      k, SemClusterTarget, KmeansIters, Dims, fp, T, None, tick)
    tick("stamps")
    val total = (System.nanoTime() - t0) / 1e9

    val nIdx = CellIndex.read(spark, T).count()
    CellIndex.drop(spark, T)

    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val phaseJson = phases
      .map { case (n, s, m, d, p) =>
        s""""$n":{"sec":${r3(s)},"mem_spill":$m,"disk_spill":$d,"peak_exec_mem":$p}"""
      }
      .mkString(",")
    val json =
      s"""{"dir":"${Bench.esc(dir)}","n_vectors":${fp.n},"k":$k,"nc":${math.ceil(math.sqrt(k.toDouble)).toInt},""" +
        s""""probes":${CellIndex.ProbeCount},"index_rows":$nIdx,"build_total_sec":${r3(total)},""" +
        s""""phases":{$phaseJson}}"""
    val outFile = sys.env.getOrElse(
      "SPARK_GRAFT_BUILD_OUT",
      s"/tmp/r15/cellbuild_${new java.io.File(dir).getName}.json"
    )
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable => System.err.println(s"[cellbuild] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
