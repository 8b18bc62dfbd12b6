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

  // q118: near-dup radius for the dHash pigeonhole join — a re-encode
  // variant perturbs ≤2 strip bytes, each flipping ≤2 gradient bits,
  // so a (variant, variant) pair sits at Hamming ≤ 8 while unrelated
  // images sit near 63 of 126 (P[≤8] ≈ 1e-24: no false pairs at any
  // plausible corpus size per block).
  val PhashMaxDist = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q118: perceptual-hash near-duplicate detection over DECODED
    // media (the LAION-shape image dedup): a 126-bit gradient dHash
    // per payload as a pure codegen'd Column tree over two 63-bit
    // BIGINT words (decode stands in as deterministic luminance
    // synthesis — no codecs in container), then Hamming ≤ 8 pairs via
    // the two-word pigeonhole chunk equi-join (Dedup.
    // hammingNearPairs2): 9 chunks × 14 bits = 16K bucket values per
    // chunk — the round-9 fix for the 60-bit geometry whose 64-value
    // chunk keys made ~14% of all pairs candidates. Hashes travel as
    // two BIGINTs, never an all-pairs scan. Oracle rebuilds the
    // identical strip bytes and compares ALL pairs — the pigeonhole
    // join must lose nothing.
    "q118_phash_neardup" -> { (s, dir) =>
      import org.apache.spark.sql.functions.{array, col}
      // strip materialized ONCE behind a lineage cut — see
      // Multimodal.dhash126FromArray for why inlining is 17× slower
      val strips = Tables
        .documents(s, dir)
        .select(col("doc_id"), array(Multimodal.lumaStrip(col("doc_id")): _*).as("sa"))
        .localCheckpoint()
      val words = Multimodal.dhash126FromArray(col("sa"))
      val sigs = strips.select(col("doc_id"), words(0).as("h0"), words(1).as("h1"))
      graft.dedup.Dedup
        .hammingNearPairs2(sigs, PhashMaxDist, Multimodal.WordBits)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
    },
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
    "q118_phash_neardup" ->
      s"""WITH d AS (SELECT doc_id, doc_id % ${Multimodal.ReencodeImages} AS img,
         |                  doc_id // ${Multimodal.ReencodeImages} AS v FROM documents),
         |js AS (SELECT unnest(range(0, ${Multimodal.StripBytes})) AS j),
         |b AS (SELECT d.doc_id, d.v, js.j,
         |             (strpos('0123456789abcdef', substring(md5(d.img || ':' || (js.j // 16)),
         |                     CAST(2 * (js.j % 16) + 1 AS INT), 1)) - 1) * 16
         |           + (strpos('0123456789abcdef', substring(md5(d.img || ':' || (js.j // 16)),
         |                     CAST(2 * (js.j % 16) + 2 AS INT), 1)) - 1) AS raw
         |      FROM d CROSS JOIN js),
         |p AS (SELECT doc_id, j,
         |             CASE WHEN v > 0 AND (j + 11 * v + doc_id * 3) % ${Multimodal.PerturbMod} = 0
         |                  THEN (raw + 16) % 256 ELSE raw END AS byte
         |      FROM b),
         |n AS (SELECT doc_id, j, byte,
         |             lead(byte) OVER (PARTITION BY doc_id ORDER BY j) AS nb FROM p),
         |h AS (SELECT doc_id,
         |             CAST(sum(CASE WHEN byte > nb AND j < ${Multimodal.WordBits}
         |                           THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
         |                           ELSE 0 END) AS BIGINT) AS h0,
         |             CAST(sum(CASE WHEN byte > nb AND j >= ${Multimodal.WordBits}
         |                           THEN (CAST(1 AS BIGINT) << CAST(j - ${Multimodal.WordBits} AS INT))
         |                           ELSE 0 END) AS BIGINT) AS h1
         |      FROM n WHERE j < ${Multimodal.StripBytes - 1} GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) AS INT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) <= $PhashMaxDist""".stripMargin,
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
