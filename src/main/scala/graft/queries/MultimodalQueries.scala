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

  /** q118's near-dup radius — geometry lives with the synthesis in
    * [[Multimodal]] (re-exported for the spec's convenience).
    */
  val PhashMaxDist: Int = Multimodal.PhashMaxDist

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q118: perceptual-hash near-duplicate detection over DECODED
    // media (the LAION-shape image dedup, ~10⁹ images in production):
    // a gradient dHash per payload as a pure codegen'd Column tree
    // over ⌈9b/63⌉ 63-bit BIGINT words (decode stands in as
    // deterministic luminance synthesis — no codecs in container),
    // then Hamming ≤ 8 pairs via the pigeonhole chunk equi-join
    // (Dedup.hammingNearPairsWide) whose chunk width b is
    // CORPUS-SCALED (round 11): b = smallest width with 8·2^b ≥ N
    // (Multimodal.phashChunkBitsFor — the q34 plane-count formula),
    // so chunk-bucket occupancy stays ~8 and spurious candidates stay
    // ~9·8·N at any corpus size. The round-10 FIXED 126-bit geometry
    // kept b = 14 forever — its 9·N²/16K candidate term went
    // super-linear at the 50× scaling point (55.45×, the only one in
    // SCALING_r10). The ONE corpus count that sizes the geometry is
    // the same sizing scan q34/q129 pay; the oracle re-derives b from
    // its own count(*) via the identical integer CASE chain, then
    // compares ALL pairs at the gradient-BYTE level (word-agnostic) —
    // the pigeonhole join must lose nothing.
    "q118_phash_neardup" -> { (s, dir) =>
      import org.apache.spark.sql.functions.{array, col}
      val docs = Tables.documents(s, dir)
      val chunkBits = Multimodal.phashChunkBitsFor(docs.count())
      val totalBits = Multimodal.PhashChunks * chunkBits
      // strip materialized ONCE behind a lineage cut — see
      // Multimodal.dhashWordsFromArray for why inlining is 17× slower.
      // spreadScan on the id-only projection (the strip derives from
      // doc_id alone, so the engaged exchange carries 8 B/row): the
      // md5 synthesis is the query's dominant compute and otherwise
      // runs on the scan's partitioning — 1 task at sf0.1 (measured
      // r19: 4.2 s of the 5.0 s query on one core).
      val spread = graft.dedup.Dedup.spreadScan(docs.select(col("doc_id")), col("doc_id"))
      val strips = Multimodal.stripFrame(spread, "doc_id", totalBits + 1).localCheckpoint()
      val words = Multimodal.dhashWordsFromArray(col("sa"), totalBits)
      val sigs =
        strips.select(col("doc_id") +: words.zipWithIndex.map { case (w, i) => w.as(s"h$i") }: _*)
      graft.dedup.Dedup
        .hammingNearPairsWide(sigs, PhashMaxDist, totalBits, Multimodal.WordBits)
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
    // chunk width b re-derived from the oracle's own count(*) via the
    // same integer thresholds phashChunkBitsFor walks; the all-pairs
    // compare runs at the gradient-BYTE level (a.gb != b.gb summed
    // over j < 9·b), which is word-decomposition-agnostic — identical
    // to the engine's multi-word bit_count by construction.
    "q118_phash_neardup" -> {
      val bitCases = (Multimodal.MinPhashChunkBits to Multimodal.MaxPhashChunkBits)
        .map(b => s"WHEN n <= ${Multimodal.PhashChunkTarget.toLong << b} THEN $b")
        .mkString(" ")
      s"""WITH geo AS (SELECT CASE $bitCases ELSE ${Multimodal.MaxPhashChunkBits} END
         |                    * ${Multimodal.PhashChunks} AS totalbits
         |             FROM (SELECT count(*) AS n FROM documents)),
         |d AS (SELECT doc_id, doc_id // 2 AS img, doc_id % 2 AS v FROM documents),
         |js AS (SELECT unnest(range(0, (SELECT totalbits + 1 FROM geo))) AS j),
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
         |n2 AS (SELECT doc_id, j, byte,
         |              lead(byte) OVER (PARTITION BY doc_id ORDER BY j) AS nb FROM p),
         |g AS (SELECT doc_id, j, CASE WHEN byte > nb THEN 1 ELSE 0 END AS gb
         |      FROM n2 WHERE j < (SELECT totalbits FROM geo)),
         |h AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |             CAST(sum(CASE WHEN a.gb != b.gb THEN 1 ELSE 0 END) AS INT) AS hamming
         |      FROM g a JOIN g b ON a.j = b.j AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT doc_a, doc_b, hamming FROM h WHERE hamming <= $PhashMaxDist""".stripMargin
    },
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
