package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft job wants.
  *
  * Local testing runs `local[32]`; the settings below are chosen so the
  * same code is correct on a 1000-executor cluster:
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join
  *     splitting replaces hand-tuned partition counts at scale.
  *   - shuffle.partitions defaults to 32 locally; on a cluster this is
  *     overridden to 2-3x total cores (AQE coalesces the excess).
  *   - UTC session timezone for oracle parity and cross-cluster
  *     determinism.
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // native graft expressions (graft_dot) for SQL + DataFrame API
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which Spark has no
      // native type for; read as nanos-since-epoch long (exact).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
