package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-verified ingest (reference: gerrydb_etl/__init__.py:33-57,
  * `download_dataframe_with_hash` — every source file is SHA256'd and
  * checked against its manifest before load).
  *
  * Spark-first shape: checksums are a scalar sha2 projection riding
  * the scan (codegen'd, no shuffle); the per-source manifest is one
  * partial-agg'd groupBy whose output is dim-sized. At 100 TB the
  * per-record hash step is embarrassingly parallel and the manifest
  * stays tiny — this is the plan a distributed checksum pass wants.
  */
object Ingest {

  /** Per-record checksums: stable identity for every ingested row. */
  def checksums(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("source"),
      col("n_chars"),
      sha2(col("text"), 256).as("checksum")
    )

  /** Per-source ingest manifest: file count, total payload size, and
    * order-independent checksum bounds (min/max over hex strings) that
    * a re-ingest can compare against without re-reading payloads.
    */
  def manifest(docs: DataFrame): DataFrame =
    checksums(docs)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("total_chars"),
        min(col("checksum")).as("first_checksum"),
        max(col("checksum")).as("last_checksum")
      )
}
