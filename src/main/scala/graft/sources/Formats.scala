package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond raw parquet.
  *
  * The reference ingests CSV census files and writes into a versioned
  * store (gerrydb_etl/__init__.py download path; pl_pop_tables.py CSV
  * loads). graft's equivalents: schema-enforced CSV / JSONL readers
  * (no inference at scale — a schema scan of 100 TB is a full read)
  * and a partition-pruned parquet layout for the lake side.
  */
object Formats {

  /** CSV with an EXPLICIT schema: inference is disabled on purpose —
    * at scale, schema inference re-reads the input; a declared schema
    * also pins types against drifting source files (the reference's
    * TabularConfig serves the same role).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST") // corrupt rows fail the ingest, not silently null out
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  /** JSON-lines with explicit schema (same rationale as CSV). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read/write — the columnar alternative a reference user may
    * already hold data in. ORC is built into Spark (no external
    * connector): predicate pushdown and column pruning reach the ORC
    * reader exactly as with parquet (SourcesSpec asserts
    * `PushedFilters` on an ORC scan), so every graft operator runs on
    * ORC inputs unchanged.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned parquet — the lake layout that makes
    * partition pruning work: a filter on a partition column must show
    * up as `PartitionFilters` in the scan (asserted in SourcesSpec),
    * meaning non-matching directories are never opened.
    */
  /** File-split guard for the one-task-per-key persisted layouts
    * below: one task per key means a HOT key serializes its whole
    * volume through one writer and, unguarded, one unbounded file.
    * The writer-level `maxRecordsPerFile` option lets that task roll
    * to a new file past the cap — oversized keys split, small keys
    * keep their single file, and the cap is a per-write option, not
    * session state a concurrent write could inherit. 16M records ≈
    * 1.6–16 GB at typical 100 B–1 KB rows: far above every test-scale
    * key (the one-file-per-bucket layout contract in SourcesSpec is
    * unaffected) while bounding the 100 TB straggler file.
    */
  val MaxRecordsPerFile: Long = 16L * 1024 * 1024

  /** Directory-partitioned parquet. The pre-write repartition hashes
    * rows by the partition columns so each partition value is written
    * by exactly ONE task → one file per directory, regardless of the
    * session's shuffle width. Without it the file count is
    * write-tasks × values-touched — a session-level knob (AQE's
    * initialPartitionNum) silently multiplying a PERSISTED artifact's
    * file count, which every later reader pays in listing + footer
    * overhead. Layout of a stored index is a contract, not a
    * runtime-tuning side effect. ([[MaxRecordsPerFile]] bounds the
    * hot-key straggler file the one-task contract would otherwise
    * allow.)
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", MaxRecordsPerFile.toString)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table: rows are hash-distributed into a fixed
    * number of buckets BY KEY at write time, so a join or aggregation
    * on that key later needs NO shuffle at all — both sides' bucket i
    * files are read by the same task (SourcesSpec asserts the bucketed
    * join plan is exchange-free). This is the materialization every
    * "at 100 TB, bucketBy(...)" scale note in this codebase refers
    * to: pay one shuffle at ingest, amortize it over every downstream
    * key-join/agg. Buckets should be sized so one bucket ≈ one task's
    * memory (numBuckets ≈ data size / 128-256 MB).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    // repartition to EXACTLY numBuckets on the bucket key: Spark's
    // bucket id and HashPartitioning use the same hash, so partition i
    // holds exactly bucket i and each bucket lands in ONE file. A
    // bucketed scan schedules one task per bucket either way — extra
    // files per bucket (write-tasks × buckets without this) buy no
    // parallelism, only listing/footer overhead on every read, and let
    // session shuffle knobs leak into the persisted layout.
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", MaxRecordsPerFile.toString)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Range-sorted parquet: rows globally ordered by `key` across
    * files AND row groups (repartitionByRange gives disjoint
    * per-file key ranges; sortWithinPartitions orders row groups
    * inside each file), so parquet min/max statistics let a narrow
    * key filter SKIP whole row groups — the scan emits ~selected
    * rows, not ~all rows (asserted on scan metrics in SourcesSpec).
    *
    * This is the third layout lever next to partitionBy (prune
    * directories by low-cardinality column) and bucketBy (shuffle-free
    * key joins): sort when the hot filter is a RANGE on a
    * high-cardinality key (time, id). At 100 TB the difference is
    * reading gigabytes instead of the full table for every
    * point-in-range query. `blockBytes` sizes row groups — the skip
    * granularity (default parquet 128 MB; smaller groups skip finer
    * but compress worse).
    */
  def writeSorted(df: DataFrame, path: String, key: String, blockBytes: Long = 128L * 1024 * 1024): Unit =
    df.repartitionByRange(org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(org.apache.spark.sql.functions.col(key))
      .write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", blockBytes.toString)
      .parquet(path)
}
