package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline: a tiny fixed probe set
  * broadcast against the corpus — one pass, no shuffle of the corpus.
  * The scale path is random-hyperplane LSH: corpus and probes map to
  * sign-pattern buckets (16 deterministic hyperplanes), the join is an
  * equi-join on bucket id, and ranking happens per bucket. At 100 TB
  * the bucketed corpus would be written bucketBy(bucket) so probe
  * lookups touch one bucket's files only.
  */
object Similarity {

  /** Sparse TF-IDF cosine similarity pairs via an inverted-index
    * self-join — the SPARSE twin of the dense embedding paths: the
    * "vector" is each document's tf·idf term weights, the "index" is
    * the term postings list, and the dot product accumulates over
    * shared terms only.
    *
    * Semantics: terms with df > dfCap are excluded from the
    * similarity space BEFORE weighting (df-capped stopword removal —
    * norms and dots all live in the capped space, so the answer is
    * exact within the declared contract, and the postings self-join
    * fans out at most dfCap² pairs per term: the same hot-key guard
    * as q31's shingle cap). idf = ln((N+1)/(df+1)) + 1 (smoothed:
    * never zero, no div-by-zero on df=N). Emits (id_a < id_b,
    * cos rounded to 4) above the threshold.
    *
    * Scale shape: tf→weights is one (doc, term) aggregate,
    * checkpointed and reused by the norm aggregate and BOTH sides of
    * the postings join; pair dots partial-aggregate map-side on
    * (a, b); norms ride back in as equi-joins. At 100 TB the postings
    * frame would be written bucketBy(term) — the cap bounds each
    * task's pair fan-out either way.
    *
    * DECLARED CONTRACT (r7 advice): membership is decided on the
    * 4dp-ROUNDED cosine, and the dot underneath is a partition-order-
    * dependent double sum — a pair whose unrounded cosine sits within
    * ~1 ulp of a 4th-decimal rounding boundary that coincides with
    * `threshold` could flip inclusion between partitionings. This is
    * the same round-then-compare class as every other FP-thresholded
    * operator here; the alternative (a half-ulp tolerance band) just
    * moves the knife edge to the band's own boundary. Callers needing
    * partition-stable membership should threshold on an integer
    * surrogate (e.g. q85's 2·n_match ≥ numPerms gate).
    */
  def tfidfCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dfCap: Int,
      threshold: Double
  ): DataFrame = {
    require(dfCap > 1, s"dfCap must exceed 1 (df=1 terms pair nothing), got $dfCap")
    val toks = docs.select(
      col(idCol).as("id"),
      explode(expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")).as("w")
    )
    val tf = toks.groupBy(col("id"), col("w")).agg(count(lit(1)).as("n_tw"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df")).filter(col("df") <= dfCap)
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val weights = tf
      .join(dfT, "w") // drops capped terms
      .crossJoin(broadcast(nDocs))
      .select(
        col("id"),
        col("w"),
        (col("n_tw").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0)).as("v")
      )
      .localCheckpoint() // feeds norms + both postings sides
    val norms = weights.groupBy(col("id")).agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
    val a = weights.select(col("w"), col("id").as("id_a"), col("v").as("va"))
    val b = weights.select(col("w"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, "w")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("va") * col("vb")).as("dot"))
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), round(col("dot") / (col("na") * col("nb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact top-k cosine neighbors of each probe (probe set must be
    * small — it is broadcast). Excludes self-matches.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus
      .select(col("vec_id"), col("v"))
      .withColumn("norm", sqrt(GraftFunctions.dot(col("v"), col("v"))))
    val p = probes
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .withColumn("pnorm", sqrt(GraftFunctions.dot(col("pv"), col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    c.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", GraftFunctions.dot(col("v"), col("pv")) / (col("norm") * col("pnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic hyperplane weights: LCG over (plane, dim) mapped to
    * [-1, 1]. Pure data, identical on every executor — shipped as a
    * literal array column (64 dims x numPlanes doubles, trivially
    * broadcastable).
    */
  def hyperplane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      // splitmix64 finalizer over the (plane, dim) index: the old
      // single-step LCG left adjacent planes visibly correlated —
      // multi-table LSH buckets stopped being independent draws and
      // the union-recall bound quietly broke (round 10: q34's
      // highest-cosine pair missed ALL 16 tables). Weights reach the
      // oracle as generated literals, so both engines see the same
      // values by construction.
      var z = (plane.toLong * dims + d) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  /** Sign-pattern bucket id from `numPlanes` hyperplanes (plane ids
    * `planeOffset until planeOffset + numPlanes`): bit p set iff
    * dot(v, plane_p) > 0. Pure Column fold.
    */
  def lshBucket(v: Column, numPlanes: Int, dims: Int, planeOffset: Int = 0): Column =
    (0 until numPlanes)
      .map { p =>
        val w = lit(hyperplane(planeOffset + p, dims).toArray)
        when(GraftFunctions.dot(v, w) > 0, shiftleft(lit(1), p)).otherwise(lit(0))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** All `numTables` (table_id, bucket) assignments of a vector, each
    * table using its own `planesPerTable` independent hyperplanes.
    * `planeStride` spaces the per-table plane-id ranges: a stride
    * LARGER than planesPerTable keeps table t's plane ids stable when
    * the plane count is corpus-scaled (the q34 convention — ids
    * t·stride .. t·stride+planesPerTable-1), so growing a corpus
    * EXTENDS each table's plane set instead of reshuffling every
    * table's geometry.
    */
  def lshTableBuckets(
      v: Column,
      numTables: Int,
      planesPerTable: Int,
      dims: Int,
      planeStride: Int = -1
  ): Column = {
    val stride = if (planeStride < 0) planesPerTable else planeStride
    require(stride >= planesPerTable, s"planeStride $stride < planesPerTable $planesPerTable")
    array((0 until numTables).map { t =>
      struct(
        lit(t).as("tbl"),
        lshBucket(v, planesPerTable, dims, planeOffset = t * stride).as("bucket")
      )
    }: _*)
  }

  /** Multi-table LSH ANN: L independent hash tables of m planes each;
    * a probe meets the union of its L buckets' corpus vectors. A
    * single-table/high-plane variant has near-zero recall (P[collide]
    * decays exponentially in planes); multiple small tables make recall
    * tunable (1 - (1 - p^m)^L) while each lookup stays a bucket
    * equi-join — at 100 TB the corpus would be written
    * bucketBy(tbl, bucket) so probes touch L file groups, not the
    * whole corpus. Candidates found by several tables are deduped on
    * (probe_id, vec_id) before ranking.
    */
  /** IVF-style ANN: partition the corpus into `numCells` Voronoi cells
    * around centroid vectors, then search only each probe's `nprobe`
    * nearest cells. The complementary scale path to LSH (q36): cells
    * adapt to the data distribution where hyperplanes are oblivious.
    *
    * "Training" is deterministic — the `numCells` lowest-id vectors
    * serve as centroids (k-means would need RNG state; determinism
    * keeps the operator engine-portable and rerun-stable). At 100 TB
    * the corpus would be written bucketBy(cell) so a probe reads
    * nprobe file groups; the centroid set is dim-table-sized and
    * broadcast.
    */
  /** Deterministic IVF "training": the `numCells` lowest-id vectors
    * serve as centroids (see ivfTopK's rationale). Shared by the
    * in-memory path, the persisted index build, and index appends —
    * ONE definition so an appended batch can never be assigned under
    * different centroids than the build.
    */
  def ivfCentroids(corpus: DataFrame, numCells: Int): DataFrame =
    corpus
      .filter(col("vec_id") < numCells)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      .withColumn("cnorm", sqrt(GraftFunctions.dot(col("cv"), col("cv"))))

  private def assignCells(
      cents: DataFrame,
      df: DataFrame,
      idCol: String,
      vCol: String,
      normCol: String,
      keep: Int
  ): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("cent_cos").desc, col("cent_id").asc)
    df.crossJoin(broadcast(cents))
      .withColumn("cent_cos", GraftFunctions.dot(col(vCol), col("cv")) / (col(normCol) * col("cnorm")))
      .withColumn("cent_rk", row_number().over(w))
      .filter(col("cent_rk") <= keep)
      .drop("cv", "cnorm", "cent_cos", "cent_rk")
  }

  /** Every vector's (cent_id, vec_id, v, norm) — the IVF index
    * content (nearest cell per vector).
    */
  def ivfAssignments(cents: DataFrame, corpus: DataFrame): DataFrame =
    assignCells(
      cents,
      corpus.select(col("vec_id"), col("v")).withColumn("norm", sqrt(GraftFunctions.dot(col("v"), col("v")))),
      "vec_id",
      "v",
      "norm",
      1
    )

  /** Each probe's `nprobe` nearest cells (probe_id, pv, pnorm, cent_id). */
  def ivfProbeCells(cents: DataFrame, probes: DataFrame, nprobe: Int): DataFrame =
    assignCells(
      cents,
      probes
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
        .withColumn("pnorm", sqrt(GraftFunctions.dot(col("pv"), col("pv")))),
      "probe_id",
      "pv",
      "pnorm",
      nprobe
    )

  /** The shared probe tail: candidates (index rows × probe cells met
    * on cent_id) scored, deduped, ranked top-k per probe.
    */
  def ivfRank(assignments: DataFrame, probeCells: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    assignments
      .join(probeCells, "cent_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id"),
        col("vec_id"),
        (GraftFunctions.dot(col("v"), col("pv")) / (col("norm") * col("pnorm"))).as("cosine")
      )
      .dropDuplicates("probe_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      numCells: Int,
      nprobe: Int
  ): DataFrame = {
    val cents = ivfCentroids(corpus, numCells)
    ivfRank(ivfAssignments(cents, corpus), ivfProbeCells(cents, probes, nprobe), k)
  }

  /** Persist the IVF index PARTITIONED by cell — the ANN twin of
    * q87's bucketed signature index, but keyed for PRUNING rather
    * than join co-location: a probe touches `nprobe` cells, and with
    * the index laid out as one directory per cent_id, dynamic
    * partition pruning turns the candidate join into a read of those
    * directories ALONE (asserted in DedupSimSpec) — at 100 TB the
    * probe cost is nprobe/numCells of the corpus, not a corpus scan.
    * Appends write new vectors' assignments into the same layout
    * under the SAME centroids (ivfCentroids is deterministic), so
    * append ≡ rebuild exactly.
    */
  def writeIvfIndex(cents: DataFrame, corpus: DataFrame, path: String): Unit =
    graft.sources.Formats.writePartitioned(ivfAssignments(cents, corpus), path, Seq("cent_id"))

  def appendIvfIndex(cents: DataFrame, newVecs: DataFrame, path: String): Unit = {
    // one file per cell per append batch (see Formats.writePartitioned)
    ivfAssignments(cents, newVecs)
      .repartition(col("cent_id"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .option("maxRecordsPerFile", graft.sources.Formats.MaxRecordsPerFile.toString)
      .partitionBy("cent_id")
      .parquet(path)
    // r15: per-batch cell-file growth bounded by the shared
    // relative-threshold compaction (no-op below it)
    compactIvfIndex(newVecs.sparkSession, path)
  }

  /** Shared small-files maintenance for the partitioned IVF layout
    * (Formats.compactPartitioned: marker-file relative trigger,
    * directory-level rename-aside swap). Returns true iff a rewrite
    * ran.
    */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      maxFilesPerCell: Int = graft.sources.Formats.DefaultCompactFilesPerBucket
  ): Boolean =
    graft.sources.Formats.compactPartitioned(spark, path, Seq("cent_id"), maxFilesPerCell)

  /** ivfTopK over the persisted index. */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cents: DataFrame,
      probes: DataFrame,
      k: Int,
      nprobe: Int
  ): DataFrame =
    ivfRank(spark.read.parquet(path), ivfProbeCells(cents, probes, nprobe), k)

  /** The table-major plane matrix for `numTables` tables of
    * `planesPerTable` planes each, table t's plane ids at
    * t·stride .. t·stride+planesPerTable-1 — the constant literal
    * [[graft.functions.GraftFunctions.lshBuckets]] hashes against in
    * one native loop (see LshBuckets for why the per-plane graft_dot
    * fold had to go: corpus-scaled plane counts pushed its generated
    * method past HotSpot's JIT threshold — a measured 25× cliff).
    */
  def lshPlaneMatrix(numTables: Int, planesPerTable: Int, dims: Int, planeStride: Int): Seq[Seq[Double]] = {
    val stride = if (planeStride < 0) planesPerTable else planeStride
    require(stride >= planesPerTable, s"planeStride $stride < planesPerTable $planesPerTable")
    for { t <- 0 until numTables; j <- 0 until planesPerTable } yield hyperplane(t * stride + j, dims)
  }

  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      numTables: Int,
      planesPerTable: Int,
      dims: Int,
      planeStride: Int = -1
  ): DataFrame = {
    val mat = lshPlaneMatrix(numTables, planesPerTable, dims, planeStride)
    val c = corpus
      .select(col("vec_id"), col("v"))
      .withColumn("norm", sqrt(GraftFunctions.dot(col("v"), col("v"))))
      .select(
        col("vec_id"),
        col("v"),
        col("norm"),
        posexplode(GraftFunctions.lshBuckets(col("v"), mat, planesPerTable)).as(Seq("tbl", "bucket"))
      )
    val p = probes
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .withColumn("pnorm", sqrt(GraftFunctions.dot(col("pv"), col("pv"))))
      .select(
        col("probe_id"),
        col("pv"),
        col("pnorm"),
        posexplode(GraftFunctions.lshBuckets(col("pv"), mat, planesPerTable)).as(Seq("tbl", "bucket"))
      )
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    c.join(broadcast(p), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id"),
        col("vec_id"),
        (GraftFunctions.dot(col("v"), col("pv")) / (col("norm") * col("pnorm"))).as("cosine")
      )
      .dropDuplicates("probe_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Product-quantization encoding — the ANN memory-budget step after
    * q81's scalar quantization: split each (integer-quantized) vector
    * into `m` contiguous subvectors of `subDim` dims and replace each
    * with the id of its nearest codeword, so a 64-dim vector stores as
    * `m` small codes (8 bytes here vs 256 for floats — the compression
    * that lets a 100 TB corpus's index fit in executor memory for ADC
    * scanning). Codebooks are the first `k` vectors' subvectors (q50's
    * deterministic-centroid convention; q119's Lloyd refinement is the
    * codebook-training counterpart and composes by feeding refined
    * centroids in as `codebooks`).
    *
    * Input `q` is KMeans.quantizeShifted output — non-negative BIGINT
    * coords, so every subspace distance is exact integer arithmetic
    * and argmin (d2, code_id) is bit-deterministic. Plan shape: the
    * codebook frame (m·k rows) broadcasts against the scan-side
    * subvector explode; ONE groupBy(vec_id) aggregate elects all m
    * winners (min over per-subspace null-gated structs — map-side
    * combinable); reconstruction error sums the winners in a
    * projection. One shuffle total, keyed by vec_id.
    */
  def pqEncode(q: DataFrame, m: Int, subDim: Int, k: Int): DataFrame = {
    require(k > 0, s"bad PQ geometry: k=$k")
    pqEncodeWith(q, q.filter(col("vec_id") < k), m, subDim)
  }

  /** [[pqEncode]] against an EXPLICIT codebook frame (vec_id, qa) —
    * one row per codeword source vector, its vec_id the code id. This
    * is the composition point q119 trains for: feed
    * `KMeans.refineCentroids(...).select(cid AS vec_id, ca AS qa)` in
    * as Lloyd-refined codebooks (KMeansSpec proves the composition
    * equals a driver-side reference). Code ids must be the contiguous
    * range 0..k-1 — ADC's positional distance tables index by
    * s·k + code_id, and a gap fails loudly there (ANSI element_at).
    *
    * `carry` names input columns to thread through the winners
    * aggregate unchanged (first() — constant per vec_id), e.g. the
    * IVF cell id so index build needs no second join back to the
    * corpus.
    */
  def pqEncodeWith(
      q: DataFrame,
      codebook: DataFrame,
      m: Int,
      subDim: Int,
      carry: Seq[String] = Nil
  ): DataFrame = {
    require(m > 0 && subDim > 0, s"bad PQ geometry: m=$m subDim=$subDim")
    val subs = subVectors(q, m, subDim, "vec_id", "sv", carry)
    val codebooks = subVectors(codebook, m, subDim, "code_id", "cv")
    val winners = subs
      .join(broadcast(codebooks), "s")
      .select(
        (Seq(col("vec_id")) ++ carry.map(col) ++
          Seq(col("s"), col("code_id"), subD2("sv", "cv", subDim).as("d2"))): _*
      )
      .groupBy(col("vec_id"))
      .agg(
        min(when(col("s") === 0, struct(col("d2"), col("code_id")))).as("m0"),
        ((1 until m).map(s => min(when(col("s") === s, struct(col("d2"), col("code_id")))).as(s"m$s")) ++
          carry.map(c => first(col(c)).as(c))): _*
      )
    winners.select(
      (Seq(col("vec_id")) ++
        (0 until m).map(s => col(s"m$s.code_id").as(s"code_$s")) ++
        Seq((0 until m).map(s => col(s"m$s.d2")).reduce(_ + _).as("recon_d2")) ++
        carry.map(col)): _*
    )
  }

  /** (id, s, subvector) explode shared by the encode/probe/codebook
    * sides — m rows per input vector.
    */
  private def subVectors(
      df: DataFrame,
      m: Int,
      subDim: Int,
      idAs: String,
      vecAs: String,
      carry: Seq[String] = Nil
  ): DataFrame = {
    val subIds = array((0 until m).map(lit): _*)
    df.select((Seq(col("vec_id").as(idAs), col("qa")) ++ carry.map(col) ++ Seq(explode(subIds).as("s"))): _*)
      .select(
        (Seq(col(idAs), col("s")) ++ carry.map(col) ++
          Seq(slice(col("qa"), col("s") * subDim + lit(1), lit(subDim)).as(vecAs))): _*
      )
  }

  /** Exact integer L2² between two subvector columns, unrolled. */
  private def subD2(a: String, b: String, subDim: Int): Column =
    (1 to subDim)
      .map { i =>
        val d = element_at(col(a), i) - element_at(col(b), i)
        d * d
      }
      .reduce(_ + _)

  /** ADC (asymmetric distance computation) top-k over the PQ codes —
    * the scan [[pqEncode]]'s compression exists for: each probe
    * precomputes a distance table d2(probe_subvector, codeword) for
    * all m·k codewords, and a corpus vector's approximate distance is
    * then m TABLE LOOKUPS summed (element_at over the probe's array)
    * instead of a 64-dim arithmetic pass — the FAISS IndexPQ search
    * shape. Plan: the distance tables (one array<bigint> of length m·k
    * per probe) CROSS-JOIN-BROADCAST against the codes scan, adc_d2 is
    * a pure projection, and per-probe top-k is ONE graft_topk bounded-
    * heap aggregate (map-side partial, no window, no sort of the
    * corpus — the q99/q115 machinery). The probes×topK winner set then
    * broadcasts back onto the codes scan to recompute its adc_d2 for
    * output (the q115 survivor-join-back pattern), so the big scored
    * frame is never shuffled or materialized.
    *
    * All arithmetic is exact BIGINT over quantizeShifted coords
    * (per-subspace d2 ≤ subDim·254², adc sums ≤ m·subDim·254² ≈ 2²²,
    * so the heap's double key is integer-exact); ties rank by
    * (adc_d2, vec_id) ascending — bit-deterministic. Self-matches
    * (vec_id == probe_id) are excluded, q35-style. At 100 TB the codes
    * frame is the PERSISTED artifact (q87/q107 story): corpus_n · m
    * small ints, rebuilt only when the codebooks retrain.
    */
  def pqAdcTopK(q: DataFrame, probes: DataFrame, m: Int, subDim: Int, kw: Int, topK: Int): DataFrame = {
    require(m > 0 && subDim > 0 && kw > 0 && topK > 0, s"bad ADC geometry: m=$m subDim=$subDim kw=$kw topK=$topK")
    GraftFunctions.ensureRegistered(q.sparkSession)
    val dt = pqDistTables(probes, q.filter(col("vec_id") < kw), m, subDim, kw)
    // The codes frame IS the persisted index artifact (q87/q107 story:
    // corpus_n · m small ints, rebuilt only on codebook retrain) — the
    // lineage cut materializes it ONCE so the scoring pass and the
    // winner join-back both scan the built index instead of re-running
    // the whole encode (which would double-scan the corpus).
    val codes = pqEncode(q, m, subDim, kw).drop("recon_d2").localCheckpoint()
    val adc = adcExpr(m, kw)
    val winners = codes
      .crossJoin(broadcast(dt))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), adc.as("adc_d2"))
      .groupBy(col("probe_id"))
      .agg(GraftFunctions.topk(col("adc_d2").cast("double"), col("vec_id"), topK).as("ids"))
      .select(col("probe_id"), posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"), col("neighbor_id"))
    codes
      .withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(winners), "neighbor_id")
      .join(broadcast(dt), "probe_id")
      .select(col("probe_id"), col("rank"), col("neighbor_id"), adc.as("adc_d2"))
  }

  /** Each probe's ADC lookup table: one m·kw-long array, position =
    * s·kw + code_id (hence the contiguous-code-id contract), built
    * from the broadcast codebook join and localCheckpoint'd
    * (probe-count rows, broadcast by every consumer).
    */
  private def pqDistTables(probes: DataFrame, codebook: DataFrame, m: Int, subDim: Int, kw: Int): DataFrame =
    subVectors(probes, m, subDim, "probe_id", "pv")
      .join(broadcast(subVectors(codebook, m, subDim, "code_id", "cv")), "s")
      .select(col("probe_id"), (col("s") * kw + col("code_id")).as("pos"), subD2("pv", "cv", subDim).as("d2"))
      .groupBy(col("probe_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("d2")))), e => e("d2")).as("dt"))
      .localCheckpoint()

  /** The ADC distance: m table lookups summed — a pure projection
    * over (code_0..code_{m-1}, dt).
    */
  private def adcExpr(m: Int, kw: Int): Column =
    (0 until m)
      .map(s => element_at(col("dt"), (col(s"code_$s") + lit(s * kw) + lit(1)).cast("int")))
      .reduce(_ + _)

  // --- IVF + PQ (round 9): the FAISS IndexIVFPQ composition
  // (by_residual=false variant — codes quantize the vectors
  // themselves, one shared codebook across cells, the standard
  // speed-oriented FAISS option): a coarse Voronoi partition bounds
  // WHICH vectors a probe scores (q107's DPP-pruned cell directories)
  // and PQ codes bound HOW MUCH each scored vector costs (q123's
  // table lookups). The probe reads nprobe/nCells of the codes — and
  // the codes are m bytes-ish per vector, so the scan term shrinks on
  // BOTH axes. An exact integer re-rank of the ADC shortlist
  // (rerank ≫ topK candidates) then removes the quantization error
  // from the final ranking — the FAISS refine stage.

  /** The coarse centroids, collected driver-side: nCells·dims longs —
    * dim-table-sized at any corpus scale. Deterministic (first-nCells
    * convention shared with q50/q107), so build, append, and probe
    * can never disagree on the partition.
    */
  def collectCentroids(q: DataFrame, nCells: Int): Seq[(Long, Seq[Long])] = {
    val cents = q
      .filter(col("vec_id") < nCells)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
      .toSeq
    require(
      cents.size == nCells,
      s"IVF coarse seeding expects vec_ids 0..${nCells - 1} present post-quantization; got ${cents.size}"
    )
    cents
  }

  /** Exact integer L2² against a LITERAL centroid — a pure scan-side
    * Column tree (the centroids are driver-collected, so cell
    * assignment needs zero joins and zero shuffles at build AND probe
    * time). Since r19 the kernel is ONE native dist2i node over an
    * array literal: the unrolled (element_at − lit)² tree was dims ×
    * nCells terms of Catalyst/codegen PER REFERENCE — with 16 cells ×
    * 64 dims re-expanded at every use site, q125 spent more time
    * planning/compiling than executing (its r19 driver gap was 2.8 s
    * of a 5.5 s query). Same left-assoc exact-BIGINT square sum,
    * bit-identical distances.
    */
  private def dist2Lit(qa: Column, ca: Seq[Long]): Column =
    GraftFunctions.dist2i(qa, lit(ca.toArray))

  /** argmin cell id over the literal centroids: a least() fold over
    * (d2, cid) structs — ties to the smallest cid, bit-deterministic.
    */
  def cellExpr(cents: Seq[(Long, Seq[Long])], qa: Column): Column =
    least(cents.map { case (cid, ca) => struct(dist2Lit(qa, ca).as("d2"), lit(cid).as("cid")) }: _*)
      .getField("cid")

  /** Build the persisted IVF+PQ index: PQ codes partitioned into one
    * directory per coarse cell — the cell id rides the encode's
    * winners aggregate as a carried column, so the build is pqEncode's
    * ONE shuffle plus the partitioned write; no join back to the
    * corpus.
    */
  def writeIvfPqIndex(q: DataFrame, nCells: Int, m: Int, subDim: Int, kw: Int, path: String): Unit = {
    val cents = collectCentroids(q, nCells)
    val withCell = q.withColumn("cell", cellExpr(cents, col("qa")))
    val codes = pqEncodeWith(withCell, q.filter(col("vec_id") < kw), m, subDim, carry = Seq("cell"))
      .drop("recon_d2")
    graft.sources.Formats.writePartitioned(codes, path, Seq("cell"))
  }

  /** Append new vectors into an existing IVF+PQ layout — the daily
    * ingest path (appendIvfIndex's twin for the composed index).
    * `base` is the ORIGINAL quantized corpus: both the coarse
    * centroids and the PQ codebooks derive from its first
    * nCells/kw vectors (the deterministic-centroid convention), so
    * appended codes are assigned and encoded under IDENTICAL geometry
    * and append ≡ rebuild exactly (spec-asserted). At scale the two
    * frames are dim-table-sized driver state (centroids) + one
    * broadcast (codebooks); the append itself is one vec_id-keyed
    * aggregate and a partitioned write into the same directories.
    */
  def appendIvfPqIndex(base: DataFrame, newVecs: DataFrame, nCells: Int, m: Int, subDim: Int, kw: Int, path: String): Unit = {
    val cents = collectCentroids(base, nCells)
    val withCell = newVecs.withColumn("cell", cellExpr(cents, col("qa")))
    val codes = pqEncodeWith(withCell, base.filter(col("vec_id") < kw), m, subDim, carry = Seq("cell"))
      .drop("recon_d2")
    // one file per cell per append batch (see Formats.writePartitioned)
    codes
      .repartition(col("cell"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .option("maxRecordsPerFile", graft.sources.Formats.MaxRecordsPerFile.toString)
      .partitionBy("cell")
      .parquet(path)
    // r15: per-batch cell-file growth bounded by the shared
    // relative-threshold compaction (no-op below it)
    compactIvfPqIndex(newVecs.sparkSession, path)
  }

  /** [[compactIvfIndex]] for the IVF+PQ codes layout. */
  def compactIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      maxFilesPerCell: Int = graft.sources.Formats.DefaultCompactFilesPerBucket
  ): Boolean =
    graft.sources.Formats.compactPartitioned(spark, path, Seq("cell"), maxFilesPerCell)

  /** The probe tail shared by the persisted and in-memory paths:
    * probe cells from a scan-side sorted literal fold (no window, no
    * shuffle), DPP-prunable broadcast join onto the codes, ADC as a
    * projection, ONE bounded-heap shortlist aggregate per probe
    * (rerank candidates), then the exact integer re-rank: the
    * shortlist (probes·rerank rows) broadcasts back onto the corpus
    * scan for true d2 and a candidate-sized rank window picks topK.
    */
  private def ivfPqRank(
      codes: DataFrame,
      q: DataFrame,
      probes: DataFrame,
      cents: Seq[(Long, Seq[Long])],
      m: Int,
      subDim: Int,
      kw: Int,
      nprobe: Int,
      rerank: Int,
      topK: Int,
      dims: Int
  ): DataFrame = {
    require(nprobe > 0 && rerank >= topK && topK > 0, s"bad IVFPQ probe: nprobe=$nprobe rerank=$rerank topK=$topK")
    GraftFunctions.ensureRegistered(q.sparkSession)
    val cellCands = array(cents.map { case (cid, ca) =>
      struct(dist2Lit(col("qa"), ca).as("d2"), lit(cid).as("cid"))
    }: _*)
    // probes·nprobe rows — the DPP build side. NOT checkpointed: the
    // DynamicPartitionPruning rule only prunes when the build side
    // carries a selective predicate, and a lineage cut would replace
    // the probes filter with a bare ExistingRDD scan (no Filter node,
    // no pruning — the codes read would scan every cell directory)
    val probeCells = probes
      .select(col("vec_id").as("probe_id"), explode(slice(array_sort(cellCands), 1, nprobe)).as("pc"))
      .select(col("probe_id"), col("pc.cid").as("cell"))
    val dt = pqDistTables(probes, q.filter(col("vec_id") < kw), m, subDim, kw)
    val shortlist = codes
      .join(broadcast(probeCells), "cell")
      .join(broadcast(dt), "probe_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), adcExpr(m, kw).as("adc_d2"))
      .groupBy(col("probe_id"))
      .agg(GraftFunctions.topk(col("adc_d2").cast("double"), col("vec_id"), rerank).as("ids"))
      .select(col("probe_id"), explode(col("ids")).as("neighbor_id"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("exact_d2").asc, col("neighbor_id").asc)
    q.select(col("vec_id").as("neighbor_id"), col("qa").as("nqa"))
      .join(broadcast(shortlist), "neighbor_id")
      .join(broadcast(probes.select(col("vec_id").as("probe_id"), col("qa").as("pqa"))), "probe_id")
      .select(
        col("probe_id"),
        col("neighbor_id"),
        graft.operators.KMeans.dist2(col("nqa"), col("pqa"), dims).as("exact_d2")
      )
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("exact_d2"))
  }

  /** IVF+PQ over the persisted index. */
  def ivfPqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      q: DataFrame,
      probes: DataFrame,
      nCells: Int,
      m: Int,
      subDim: Int,
      kw: Int,
      nprobe: Int,
      rerank: Int,
      topK: Int,
      dims: Int
  ): DataFrame =
    ivfPqRank(
      spark.read.parquet(path),
      q,
      probes,
      collectCentroids(q, nCells),
      m,
      subDim,
      kw,
      nprobe,
      rerank,
      topK,
      dims
    )

  /** The index-free twin — same logical query, codes built in-memory.
    * DedupSimSpec asserts the persisted path is byte-equal to this.
    */
  def ivfPqTopK(
      q: DataFrame,
      probes: DataFrame,
      nCells: Int,
      m: Int,
      subDim: Int,
      kw: Int,
      nprobe: Int,
      rerank: Int,
      topK: Int,
      dims: Int
  ): DataFrame = {
    val cents = collectCentroids(q, nCells)
    val codes = pqEncodeWith(
      q.withColumn("cell", cellExpr(cents, col("qa"))),
      q.filter(col("vec_id") < kw),
      m,
      subDim,
      carry = Seq("cell")
    ).drop("recon_d2").localCheckpoint()
    ivfPqRank(codes, q, probes, cents, m, subDim, kw, nprobe, rerank, topK, dims)
  }
}
