package graft


/** Ad-hoc profiling main: times a subset of SparkEntry queries (args =
  * name substrings; empty = all) with N repetitions, printing per-run
  * timings so warm-vs-cold and codegen-compile effects are visible.
  * Same execution discipline as Bench (noop sink).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.Profile q31 q33 --reps=2 --explain"
  */
object Profile {

  /** Data-exchange count in a physical plan string (broadcast
    * exchanges excluded — they are the cheap alternative). The ONE
    * counting rule shared by the --shuffles census and PlanSpec's
    * budget assertion, so the measurement tool and the gate cannot
    * drift apart.
    *
    * Exchanges carrying a plan_id are counted ONCE per id: a scalar
    * subquery referenced from several operators re-renders its whole
    * subtree (same plan_id) at every reference site, but executes
    * once — q102's bloom-build exchange would otherwise count 3×.
    * Id-less renderings keep the raw count. KNOWN LIMITATION (r7
    * advice): plan strings rendered WITHOUT plan ids (AQE off) can
    * therefore still overcount a multiply-referenced subquery
    * exchange once per rendering — deduping identical id-less
    * subtree strings would instead UNDERcount genuinely distinct
    * exchanges that happen to render identically (two scans of the
    * same table aggregated the same way), so the census accepts the
    * conservative overcount there. PlanSpec budgets run with AQE on
    * (plan ids present), where the count is exact.
    */
  def countShuffles(plan: String): Int = {
    val withId = "Exchange (?:hash|range|SinglePartition)[^\n]*\\[plan_id=(\\d+)\\]".r
    val idMatches = withId.findAllMatchIn(plan).toSeq
    val distinctIds = idMatches.map(_.group(1)).toSet.size
    val all = "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).size
    distinctIds + (all - idMatches.size)
  }

  def main(args: Array[String]): Unit = {
    val reps = args.collectFirst { case a if a.startsWith("--reps=") => a.drop(7).toInt }.getOrElse(1)
    val explain = args.contains("--explain")
    val filters = args.filterNot(_.startsWith("--"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      filters.isEmpty || filters.exists(n.contains)
    }
    if (args.contains("--shuffles")) {
      // shuffle census: data exchanges (shuffle) vs broadcast exchanges
      // per initial physical plan — the inputs to PlanSpec's budgets
      selected.foreach { case (name, fn) =>
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val bcasts = "BroadcastExchange".r.findAllIn(p).size
        println(s"""[shuffles] "$name" -> ${Profile.countShuffles(p)}, // bcast=$bcasts""")
      }
      spark.stop()
      return
    }
    selected.foreach { case (name, fn) =>
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}s")
    }
    spark.stop()
  }
}
