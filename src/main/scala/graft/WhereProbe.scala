package graft

import scala.collection.mutable

/** Per-query time ATTRIBUTION at bench scale — the round-19 "measure
  * first" instrument: for each selected query, two noop-sink passes
  * (Bench's estimator), with pass-2 decomposed into
  *   - n_jobs / n_stages / n_tasks,
  *   - sum of stage wall (executor-side time),
  *   - driver_gap = wall − max-stage-concurrency-corrected stage time
  *     (approximated as wall − Σ stage wall when stages don't overlap;
  *     at local[32] with one query at a time they mostly don't),
  *   - the top stages by wall with task counts and descs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.WhereProbe q125 q104 ..."
  * Output: one JSON line per query + /tmp/r19/whereprobe.json
  */
object WhereProbe {
  def main(args: Array[String]): Unit = {
    val filters = args.filterNot(_.startsWith("--"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    graft.sources.Tables.All.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    case class St(id: Int, tasks: Int, wallSec: Double, desc: String)
    val stages = mutable.ArrayBuffer[St]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3).getOrElse(-1.0)
        stages.synchronized {
          stages += St(si.stageId, si.numTasks, wall, si.name.takeWhile(_ != '\n').take(90))
        }
      }
    })

    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      filters.isEmpty || filters.exists(n.contains)
    }
    val out = mutable.ArrayBuffer[String]()
    selected.foreach { case (name, fn) =>
      // pass 1: warm (plan compile + JIT), timed but not decomposed
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val p1 = (System.nanoTime() - t1) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)
      // pass 2: decomposed
      stages.synchronized(stages.clear())
      jobs.set(0)
      val t2 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val p2 = (System.nanoTime() - t2) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 10000L)
      val ss = stages.synchronized(stages.toSeq)
      val stageSum = ss.map(_.wallSec).sum
      val top = ss.sortBy(-_.wallSec).take(8)
      val topJson = top
        .map(s => f"""{"stage":${s.id},"tasks":${s.tasks},"sec":${s.wallSec}%.2f,"desc":"${Bench.esc(s.desc)}"}""")
        .mkString("[", ",", "]")
      val line =
        f"""{"query":"${Bench.esc(name)}","pass1_sec":$p1%.2f,"pass2_sec":$p2%.2f,""" +
          f""""jobs":${jobs.get},"stages":${ss.size},"tasks":${ss.map(_.tasks).sum},""" +
          f""""stage_wall_sum":$stageSum%.2f,"driver_gap":${p2 - stageSum}%.2f,"top_stages":$topJson}"""
      println(line)
      out += line
    }
    val outFile = sys.env.getOrElse("SPARK_GRAFT_WHEREPROBE_OUT", "/tmp/r19/whereprobe.json")
    try {
      new java.io.File(outFile).getParentFile.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile),
        out.mkString("[", ",\n", "]")
      )
    } catch { case e: Throwable => System.err.println(s"[whereprobe] could not write: ${e.getMessage}") }
    spark.stop()
  }
}
