package graft

import scala.collection.mutable

/** Per-STAGE wall/spill/shuffle attribution for ANY SparkEntry query —
  * the generalization of [[Q32Probe]]'s stage listener the r16 verdict
  * asked for (#3: name q34's 2048× ENOSPC stage; #5: attribute q138's
  * 303 GiB mem-spill). One pass of the real production plan (the same
  * noop-sink evaluation Bench uses — no phase checkpoints, so the
  * probe adds ZERO disk pressure of its own, which matters when the
  * question is "which stage filled the disk"), with every completed
  * stage's wall, task count, spill, shuffle read/write and input bytes
  * recorded and dumped as JSON.
  *
  * Usage: sbt "runMain graft.StageProbe <queryName> [derivedDir]"
  *   output: one JSON line + SPARK_GRAFT_STAGEPROBE_OUT
  *   (default /tmp/r17/stageprobe_<query>_<basename>.json)
  *
  * Shuffle-write bytes per stage are the disk-budget column: a local
  * run's free disk must cover max-concurrent(shuffle writes) + sort
  * spills, so the stage table directly prices a decade before it runs.
  */
object StageProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <queryName> [derivedDir]")
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/repo/target/sf100-derived")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    case class St(
        id: Int,
        tasks: Int,
        wallSec: Double,
        memSpill: Long,
        diskSpill: Long,
        shufWrite: Long,
        shufRead: Long,
        input: Long,
        rows: Long,
        desc: String
    )
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3).getOrElse(-1.0)
          stages.synchronized {
            stages += St(
              si.stageId,
              si.numTasks,
              wall,
              m.memoryBytesSpilled,
              m.diskBytesSpilled,
              m.shuffleWriteMetrics.bytesWritten,
              m.shuffleReadMetrics.totalBytesRead,
              m.inputMetrics.bytesRead,
              m.outputMetrics.recordsWritten,
              si.name.takeWhile(_ != '\n').take(100)
            )
          }
          if (m.memoryBytesSpilled > 0 || m.shuffleWriteMetrics.bytesWritten > (1L << 30))
            println(
              f"[stageprobe] stage ${si.stageId}%4d ${si.numTasks}%5d tasks ${wall}%8.1f s" +
                f"  spill ${m.memoryBytesSpilled / 1e9}%7.2f/${m.diskBytesSpilled / 1e9}%6.2f GB" +
                f"  shufW ${m.shuffleWriteMetrics.bytesWritten / 1e9}%7.2f GB  ${si.name.takeWhile(_ != '\n').take(70)}"
            )
        }
      }
    })

    val t0 = System.nanoTime()
    val err =
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(e.toString.replaceAll("\\s+", " ").take(300)) }
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)

    val rows = stages.synchronized { stages.sortBy(_.id) }.map { s =>
      f"""{"stage":${s.id},"tasks":${s.tasks},"sec":${s.wallSec}%.1f,"mem_spill":${s.memSpill},""" +
        f""""disk_spill":${s.diskSpill},"shuffle_write":${s.shufWrite},"shuffle_read":${s.shufRead},""" +
        f""""input":${s.input},"desc":"${Bench.esc(s.desc)}"}"""
    }
    val errField = err.map(e => s""","failed":"${Bench.esc(e)}"""").getOrElse("")
    val json =
      s"""{"query":"${Bench.esc(name)}","dir":"${Bench.esc(dir)}","sec":${"%.1f".format(sec)}$errField,""" +
        s""""stages":[${rows.mkString(",")}]}"""
    val outFile = sys.env.getOrElse(
      "SPARK_GRAFT_STAGEPROBE_OUT",
      s"/tmp/r17/stageprobe_${name}_${new java.io.File(dir).getName}.json"
    )
    try {
      new java.io.File(outFile).getParentFile.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    } catch { case e: Throwable => System.err.println(s"[stageprobe] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
    if (err.isDefined) sys.exit(2)
  }
}
