package graft

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line.
  *
  * Execution is a noop-format write, NOT count(): Catalyst prunes
  * unused projections under a count, so narrow scalar queries would be
  * timed as scan-only (round-1 bug — fingerprint/regex work never
  * ran). The noop sink materializes every output column.
  *
  * Failures are reported as failures (in a `failed` object, excluded
  * from `queries`/total) — a broken query must not look fast.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    graft.sources.Tables.All.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
    }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
          System.err.println(s"[bench] $name FAILED: ${failed(name)}")
      }
    }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"n_failed":${failed.size},"sf":"$sfDir"}"""
    )
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
