package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.DedupSimQueries.{JaccardThreshold, MaxShingleDf, NumPerms, RowsPerBand}
import graft.sources.Tables

/** Stage-level decomposition of the q32 MinHash pipeline — wall,
  * spill, and row count PER PHASE, each phase materialized behind a
  * checkpoint so the next phase never re-pays it. The r16 spill hunt
  * needed this: q32's whole-query resource numbers (one sum over ~10
  * stages) kept every hypothesis alive; per-phase splits kill all but
  * the right one.
  *
  * Usage: sbt "runMain graft.Q32Probe [derivedDir]"
  *   output: one JSON line + SPARK_GRAFT_Q32_OUT
  *   (default /tmp/r16/q32probe_<basename>.json)
  */
object Q32Probe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf100-derived")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val mem = new AtomicLong
    val disk = new AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { mem.addAndGet(m.memoryBytesSpilled); disk.addAndGet(m.diskBytesSpilled) }
      }
      // per-STAGE attribution (the phases span several stages each —
      // phase sums alone kept competing spill hypotheses alive)
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = si.taskMetrics
        if (ms != null && ms.memoryBytesSpilled > 0)
          println(
            f"[q32probe]   stage ${si.stageId}%4d ${si.numTasks}%4d tasks  mem ${ms.memoryBytesSpilled / 1e9}%7.2f GB" +
              f"  disk ${ms.diskBytesSpilled / 1e9}%6.2f GB  ${si.name.takeWhile(_ != '\n').take(80)}"
          )
      }
    })

    val phases = scala.collection.mutable.ArrayBuffer[String]()
    def phase(name: String)(f: => DataFrame): DataFrame = {
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)
      mem.set(0); disk.set(0)
      val t0 = System.nanoTime()
      val out = f.localCheckpoint()
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)
      phases += f""""$name":{"sec":$sec%.2f,"rows":$n,"mem_spill":${mem.get},"disk_spill":${disk.get}}"""
      println(f"[q32probe] $name%-14s ${sec}%8.2f s  $n%12d rows  mem ${mem.get / 1e9}%6.2f GB  disk ${disk.get / 1e9}%6.2f GB")
      out
    }

    val docs = Tables.documents(spark, dir)
    // ONE fused phase for the shared checkpoint, exactly as
    // DedupSimQueries.shingles3 builds it — phase-per-operator here
    // pinned an extra 139M-row checkpoint in storage at 512× and
    // OOM'd a stage production never runs. r17: Dedup.shingles now
    // dedupes in-row (graft_shingleset) — the corpus-wide distinct
    // this probe stage-attributed to death no longer exists.
    val capped = phase("shingles3")(
      Dedup.dfCapped(Dedup.shingles(docs, "doc_id", "text", 3), MaxShingleDf)
    )
    val sigs = phase("signatures")(Dedup.minhashSignatures(capped, NumPerms))
    val cands = phase("candidates")(Dedup.lshCandidates(sigs, NumPerms, RowsPerBand))
    val out = phase("verify")(Dedup.verifyJaccard(capped, cands, JaccardThreshold))
    val _ = out

    val json = s"""{"dir":"${Bench.esc(dir)}","phases":{${phases.mkString(",")}}}"""
    val outFile = sys.env.getOrElse(
      "SPARK_GRAFT_Q32_OUT",
      s"/tmp/r16/q32probe_${new java.io.File(dir).getName}.json"
    )
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    catch { case e: Throwable => System.err.println(s"[q32probe] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
