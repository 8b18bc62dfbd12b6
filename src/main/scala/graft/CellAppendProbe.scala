package graft

import org.apache.spark.sql.functions._

import graft.operators.CellIndex
import graft.queries.DedupSimQueries
import graft.sources.Tables

/** The multi-append read-premium trajectory (r13 verdict #7) and the
  * compaction adjudication (#2): each in-band append batch adds one
  * parquet file per bucket (the layout pin), and the r13 decade probe
  * measured a ~1.5× maintained-read premium after ONE batch — this
  * charts the premium against BATCH COUNT, with and without the
  * round-14 compaction step, so the [[CellIndex.CompactFilesPerBucket]]
  * threshold is a calibrated number instead of a guess.
  *
  * Shape: build the base index over the first `baseReplicas` replica
  * key-ranges of a derived corpus, then run `batches` sequential
  * [[CellIndex.appendAndMaintain]] batches of `batchReplicas` replicas
  * each with the occupancy monitor DISARMED (overFactor = 1e9 — the
  * premium under test is the in-band steady state; a retrain would
  * reset the files and change the geometry mid-chart). Per batch,
  * record: append seconds, files-per-bucket after maintenance, whether
  * compaction ran, and a standing consumer read (per-cluster count +
  * a qa-column sum, so the data pages are actually read, min of 2
  * against era noise). Arms:
  *   - `no_compact`: threshold Int.MaxValue — the r13 behavior, the
  *     premium grows with every batch;
  *   - `compact`: the default threshold — files reset to 1/bucket
  *     whenever they exceed it.
  *
  * Usage: sbt "runMain graft.CellAppendProbe [dir] [baseReplicas] [batches] [batchReplicas]"
  *   default: target/sf100-derived 68 8 4
  *   output: one JSON line + SPARK_GRAFT_APPEND_OUT
  *   (default /tmp/r14/cell_append.json)
  */
object CellAppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf100-derived")
    val baseReplicas = if (args.length > 1) args(1).toInt else 68
    val batches = if (args.length > 2) args(2).toInt else 8
    val batchReplicas = if (args.length > 3) args(3).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    import DedupSimQueries.{Dims, KmeansIters, KmeansK, SemClusterTarget}

    val emb = Tables.embeddings(spark, dir)
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def cut(replicas: Int): Long = ScaleUp.KeyStride * replicas
    def filesPerBucket(t: String): Double = {
      val meta = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
      val loc = new org.apache.hadoop.fs.Path(meta.location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val n = fs.listStatus(loc).count(s => s.isFile && s.getPath.getName.startsWith("part-"))
      n.toDouble / meta.bucketSpec.map(_.numBuckets).getOrElse(1)
    }
    def consumerRead(t: String): Double = {
      def once: Double = timed {
        CellIndex
          .read(spark, t)
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n"), sum(element_at(col("qa"), 1)).as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      math.min(once, once) // min-of-2: era noise is strictly additive
    }

    def arm(name: String, threshold: Int): String = {
      val t = s"graft_append_probe_$name"
      CellIndex.drop(spark, t)
      val base = emb.filter(col("vec_id") < cut(baseReplicas))
      val buildSec = timed {
        CellIndex.ensure(base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, t)
      }
      val read0 = consumerRead(t)
      val rows = (1 to batches).map { b =>
        val lo = cut(baseReplicas + (b - 1) * batchReplicas)
        val hi = cut(baseReplicas + b * batchReplicas)
        val batch = emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
        val corpus = emb.filter(col("vec_id") < hi)
        val appendSec = timed {
          CellIndex.appendAndMaintain(
            batch, corpus, "vec_id", "embedding", Some("label"),
            KmeansK, SemClusterTarget, KmeansIters, Dims, t,
            overFactor = 1e9, compactFilesPerBucket = threshold)
        }
        val fpb = filesPerBucket(t)
        val readSec = consumerRead(t)
        def r3(v: Double): Double = math.round(v * 1000) / 1000.0
        s"""{"batch":$b,"append_sec":${r3(appendSec)},"files_per_bucket":${r3(fpb)},""" +
          s""""consumer_read_sec":${r3(readSec)},"read_premium":${r3(readSec / read0)}}"""
      }
      CellIndex.drop(spark, t)
      def r3(v: Double): Double = math.round(v * 1000) / 1000.0
      s""""$name":{"build_sec":${r3(buildSec)},"base_read_sec":${r3(read0)},"batches":[${rows.mkString(",")}]}"""
    }

    val noCompact = arm("no_compact", Int.MaxValue)
    val compact = arm("compact", CellIndex.CompactFilesPerBucket)
    val json =
      s"""{"dir":"${Bench.esc(dir)}","base_replicas":$baseReplicas,"batches":$batches,""" +
        s""""batch_replicas":$batchReplicas,"compact_threshold":${CellIndex.CompactFilesPerBucket},""" +
        s"""$noCompact,$compact}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_APPEND_OUT", "/tmp/r14/cell_append.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable => System.err.println(s"[append] could not write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
