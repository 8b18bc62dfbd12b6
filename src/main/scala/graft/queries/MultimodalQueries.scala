package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Ingest
import graft.multimodal.Multimodal
import graft.sources.Tables

/** §2.G multimodal metadata (q40) + hash-verified ingest manifest
  * (q41, reference gerrydb_etl/__init__.py:33-57).
  *
  * q40 is fully oracle-checked (better than the survey's promised
  * rows-only): payload synthesis is deterministic hex both engines can
  * construct, so size/magic/sniff/checksum all hash-compare. The
  * decode STUB (mapPartitions) is exercised by MultimodalSpec.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_multimodal_meta" -> { (s, dir) =>
      Multimodal
        .extractMeta(Multimodal.synthesize(Tables.documents(s, dir)))
        .withColumn("byte_size", org.apache.spark.sql.functions.col("byte_size").cast("long"))
    },
    "q41_ingest_manifest" -> { (s, dir) =>
      Ingest.manifest(Tables.documents(s, dir))
    },
    // q59: frame sampling — 4 evenly-strided 16-byte windows per
    // payload (video-frame / audio-window extraction plumbing).
    "q59_frame_sample" -> { (s, dir) =>
      Multimodal.frameSample(Multimodal.synthesize(Tables.documents(s, dir)), nFrames = 4, frameLen = 16)
    }
  )

  def oracle: Map[String, String] = Map(
    "q40_multimodal_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
        |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '89504E47' WHEN 1 THEN 'FFD8FFE0' ELSE '52494646' END
        |           || repeat(sha256(text), 3) AS payload_hex,
        |         CAST(16 + (doc_id * 37) % 240 AS INT) AS width,
        |         CAST(16 + (doc_id * 53) % 240 AS INT) AS height
        |  FROM documents)
        |SELECT doc_id, fmt,
        |       CASE upper(substring(payload_hex, 1, 8))
        |         WHEN '89504E47' THEN 'png' WHEN 'FFD8FFE0' THEN 'jpeg'
        |         WHEN '52494646' THEN 'wav' ELSE 'unknown' END AS sniffed_fmt,
        |       octet_length(from_hex(payload_hex)) AS byte_size,
        |       upper(substring(payload_hex, 1, 8)) AS magic_hex,
        |       width, height,
        |       CAST(width AS BIGINT) * height AS n_pixels,
        |       sha256(payload_hex) AS checksum
        |FROM m""".stripMargin,
    "q59_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
        |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '89504E47' WHEN 1 THEN 'FFD8FFE0' ELSE '52494646' END
        |           || repeat(sha256(text), 3) AS payload_hex
        |  FROM documents),
        |f AS (SELECT doc_id, fmt, payload_hex,
        |             unnest(range(0, 4)) AS frame_id,
        |             octet_length(from_hex(payload_hex)) AS total
        |      FROM m),
        |pos AS (SELECT doc_id, fmt, payload_hex, frame_id,
        |               (frame_id * greatest(CAST(total AS BIGINT) - 16, 0)) // 3 AS s
        |        FROM f)
        |SELECT doc_id, fmt, CAST(frame_id AS INT) AS frame_id,
        |       octet_length(from_hex(substring(payload_hex, CAST(2 * s + 1 AS INT), 32))) AS frame_bytes,
        |       upper(substring(payload_hex, CAST(2 * s + 1 AS INT), 4)) AS frame_head_hex
        |FROM pos""".stripMargin,
    "q41_ingest_manifest" ->
      """SELECT source, count(*) AS n_files,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(sha256(text)) AS first_checksum,
        |       max(sha256(text)) AS last_checksum
        |FROM documents
        |GROUP BY source""".stripMargin
  )
}
