package graft

/** Ad-hoc plan inspection aid: `sbt "Test/runMain graft.PlanDump <query>"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q102_bloom_semi_join"
    val spark = TestSpark.spark
    val p = SparkEntry.queries(name)(spark, TestSpark.sf).queryExecution.executedPlan
    println(s"=== PLAN $name ===")
    println(p.toString)
    spark.stop()
  }
}
