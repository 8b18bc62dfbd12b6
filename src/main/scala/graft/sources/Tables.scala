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
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
