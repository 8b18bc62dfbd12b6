package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single place where graft reads its input tables.
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so callers should `.select`/
  * `.filter` as early as possible and NEVER cache the raw table. At
  * cluster scale the same loaders work on a directory of thousands of
  * parquet files; `spark.sql.files.maxPartitionBytes` governs split
  * sizing, not this code.
  */
object Tables {

  /** Every input table — the single inventory Bench's scan warmup and
    * any whole-lake operation iterate (keep in sync by adding loaders
    * below AND a name here).
    */
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  /** Events with `ts` normalized to BIGINT nanoseconds since epoch —
    * the single timestamp convention every event operator computes in.
    * Generators have shipped the column as INT64 nanos, parquet
    * TIMESTAMP(NANOS) (read as long via `nanosAsLong`) and parquet
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ); all three land here as
    * the same exact integer. The NTZ→LTZ cast is wall-clock-exact
    * because every graft session pins spark.sql.session.timeZone=UTC
    * (GraftSession), matching the oracle's epoch_us/epoch_ns reading
    * of naive timestamps.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _: org.apache.spark.sql.types.TimestampNTZType | _: org.apache.spark.sql.types.TimestampType =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts").cast("timestamp")
          ) * 1000L
        )
      case other =>
        throw new IllegalArgumentException(
          s"events.ts must be INT64 nanos or a parquet timestamp; got $other"
        )
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
