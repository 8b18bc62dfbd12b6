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

  /** Near-dup Hamming radius for the dHash pigeonhole join: a
    * re-encode variant perturbs ≤[[PhashMaxDist]]/2 strip bytes, each
    * flipping ≤2 gradient bits, so a (original, variant) pair sits at
    * Hamming ≤ PhashMaxDist while unrelated images sit near
    * totalBits/2 (P[≤8 of ≥126] ≈ 1e-24: no false pairs at any
    * plausible per-block corpus size).
    */
  val PhashMaxDist = 8

  /** Pigeonhole chunk count — maxDist+1 disjoint chunks guarantee a
    * ≤ maxDist pair agrees exactly on at least one.
    */
  val PhashChunks: Int = PhashMaxDist + 1

  /** Target chunk-bucket occupancy: the chunk width b is the smallest
    * in [[MinPhashChunkBits]], [[MaxPhashChunkBits]]] with
    * PhashChunkTarget·2^b ≥ N — the q34 corpus-scaled-geometry
    * formula applied to pigeonhole blocking (SURVEY §4 round-10
    * rule). Spurious candidates are ~PhashChunks·N²/2^b ≤
    * PhashChunks·PhashChunkTarget·N: linear in N at any corpus size,
    * where the round-10 FIXED 126-bit geometry (b = 14 forever) was
    * quadratic past N ≈ 10⁵ — the 55× super-linear 50× point in
    * SCALING_r10.
    */
  val PhashChunkTarget = 8
  val MinPhashChunkBits = 14

  /** Upper bound on the chunk width: b = 24 serves
    * PhashChunkTarget·2^24 ≈ 134M images; the cap exists because the
    * perturbation-radius contract (see [[stripFrame]]) bounds the
    * SYNTHETIC strip length at PerturbMod·(PhashMaxDist/2) = 268
    * bytes (b ≤ 29) — a real decoder has no such bound and would
    * raise the cap with a wider PerturbMod-free downscale.
    */
  val MaxPhashChunkBits = 24

  /** Smallest chunk width whose bucket cardinality keeps occupancy
    * ~[[PhashChunkTarget]] at corpus size n (shared as a CASE chain
    * with the q118 oracle so both sides derive it integer-exactly).
    */
  def phashChunkBitsFor(n: Long): Int =
    (MinPhashChunkBits to MaxPhashChunkBits)
      .find(b => (PhashChunkTarget.toLong << b) >= n)
      .getOrElse(MaxPhashChunkBits)

  /** Gradient bits per signature word. */
  val WordBits = 63

  /** Perturbation modulus for the re-encode synthesis: positions
    * j ≡ r (mod 67) over j ∈ [0, stripBytes) hit at most
    * ⌈stripBytes/67⌉ strip bytes; each byte sits in two adjacent
    * gradient comparisons, so a variant lands at Hamming ≤
    * 2·⌈stripBytes/67⌉ of its original — the [[stripFrame]] require
    * keeps that within the ≤ [[PhashMaxDist]] near-dup radius.
    */
  val PerturbMod = 67

  /** Deterministic decoded-luminance synthesis — the STAND-IN for a
    * real decode→grayscale→downscale stage (no codecs in container):
    * byte j of image `img` comes from md5(img ":" j/16) (16 bytes per
    * md5 call), and a re-encode variant perturbs the strip positions
    * where (j + 11·v + 3·doc_id) ≡ 0 (mod [[PerturbMod]]) by +16 —
    * the "same picture, slightly different pixels" signature a lossy
    * re-encode leaves. Every byte is an engine-portable integer
    * expression, so the DuckDB oracle rebuilds the identical strip.
    *
    * FAMILY STRUCTURE (round 11): img = doc_id div 2, v = doc_id % 2
    * — every image appears exactly TWICE (original + one re-encode),
    * so the planted duplicate-family size is a CONSTANT independent
    * of N. The round-10 synthesis (img = doc_id % 250) tied family
    * size to N/250: at the 50× scaling point each image had 1000
    * variants and the TRUE pair set alone was ~1.25e8 rows — an
    * output-sized quadratic no blocking geometry can fix, and
    * exactly the degenerate-replication pathology ScaleUp's fairness
    * transform exists to avoid (its 1e9 key stride is ≡ 0 mod 250,
    * so replicas cloned the same 250 images). A real re-encode corpus
    * (LAION-shape, 10⁹ images) keeps bounded family sizes as it
    * grows; div-2 pairing is immune to key-shifted replication by
    * construction.
    */
  def stripFrame(docs: DataFrame, idCol: String, stripBytes: Int): DataFrame = {
    require(
      2 * ((stripBytes + PerturbMod - 1) / PerturbMod) <= PhashMaxDist,
      s"strip of $stripBytes bytes can perturb ${(stripBytes + PerturbMod - 1) / PerturbMod} positions " +
        s"(> ${PhashMaxDist / 2}) — planted variants would exceed the Hamming radius $PhashMaxDist; " +
        "widen PerturbMod with the strip"
    )
    val docId = col(idCol)
    // shiftright/bitwiseAND, not `/` and `%` through doubles: doc_id
    // is non-negative, so these are exact integer div-2/mod-2 at any
    // id magnitude (the oracle's `//` and `%`)
    val img = shiftright(docId, 1)
    val v = docId.bitwiseAND(1)
    val nHashes = (stripBytes + 15) / 16
    // the whole strip's hex: ⌈stripBytes/16⌉ md5 blocks, each computed
    // ONCE, concatenated — byte j is hex pair [2j, 2j+2). The
    // round-10 shape (a flat 2·stripBytes-expression projection
    // re-deriving the md5 chain per nibble) blew the generated method
    // past janino's limits (ERROR CodeGenerator → interpreted
    // fallback, re-evaluating each md5 32×); a single `transform`
    // lambda keeps the tree tiny and does one conv per byte.
    val hs = concat((0 until nHashes).map(c => md5(concat(img.cast("string"), lit(":"), lit(c)))): _*)
    val bytes = transform(
      sequence(lit(0), lit(stripBytes - 1)),
      j => {
        val raw = conv(hs.substr(j * 2 + 1, lit(2)), 16, 10).cast("long")
        when(v > 0 && (j.cast("long") + lit(11) * v + docId * 3) % PerturbMod === 0, (raw + 16) % 256)
          .otherwise(raw)
          // SMALLINT, not BIGINT: byte values are 0..255 and the strip
          // is MATERIALIZED per doc (the localCheckpoint behind the
          // q118 signature build) — at the 1024× decade the 8-byte
          // elements made the cached strip ~8 GB for 5.2M docs and the
          // pigeonhole join's execution memory thrashed the heap
          // (GCLocker retry storms, 20-min stalls); 2-byte elements
          // cut the cache 4× with identical comparison semantics
          .cast("smallint")
      }
    )
    docs.select(docId.as(idCol), bytes.as("sa"))
  }

  /** totalBits-wide dHash as ⌈totalBits/63⌉ 63-bit words: gradient
    * bit i = strip[i] > strip[i+1] (the gradient-sign hash real image
    * pipelines use on downscaled luminance rows); bits 63w..63w+62
    * fold into word w — each word a flat codegen'd expression tree of
    * distinct powers of two, so the sum IS the bit-OR and no word
    * touches its sign bit on either engine. The width is the
    * CORPUS-SCALED [[PhashChunks]]·[[phashChunkBitsFor]] — a real
    * dHash has gradient bits to spare (this is a
    * PhashChunks×chunkBits downscale instead of 8×8).
    *
    * Input is a MATERIALIZED strip array column: folding the synthesis
    * exprs directly into the comparisons lets Catalyst's
    * CollapseProject + SimplifyExtractValueOps re-inline each md5+conv
    * byte chain at every bit that references it (~2 copies per byte —
    * the 60-bit ancestor measured 11.9 s cold at 500 rows). Computing
    * the strip ONCE into an array behind a lineage cut and hashing via
    * element_at keeps the comparisons interpretation-trivial.
    */
  def dhashWordsFromArray(strip: Column, totalBits: Int): Seq[Column] = {
    val nWords = (totalBits + WordBits - 1) / WordBits
    (0 until nWords).map { w =>
      (w * WordBits until math.min((w + 1) * WordBits, totalBits))
        .map(i => when(element_at(strip, i + 1) > element_at(strip, i + 2), lit(1L << (i - w * WordBits))).otherwise(lit(0L)))
        .reduce(_ + _)
    }
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
