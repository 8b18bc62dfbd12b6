package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Fixed-iteration PageRank over an edge list — the link-authority
  * signal a crawl-scale training pipeline uses to weight domains
  * (OPIC/harmonic-centrality style quality priors), and the engine's
  * one genuinely ITERATIVE graph pattern beyond q55's union-find.
  *
  * Semantics (deterministic, engine-portable): nodes are every id
  * appearing as src or dst; r₀ = 1/N; for t in 1..iterations
  *
  *   rₜ(v) = (1-d)/N + d · Σ_{(u,v)∈E} rₜ₋₁(u) / outdeg(u)
  *
  * — the damped power iteration WITHOUT dangling-mass redistribution
  * (a sink's rank leaks; total mass < 1). That keeps every iteration
  * a pure join+aggregate, so the SAME arithmetic runs in any SQL
  * engine (the DuckDB oracle unrolls the loop as chained CTEs) and
  * the fixed iteration count makes the result exact-comparable, not
  * convergence-dependent.
  *
  * Scale shape: the edge list joins on src every iteration, so it is
  * hash-partitioned by src ONCE and localCheckpointed — each of the
  * `iterations` rounds then pays one shuffle for the rank frame and
  * one for the dst aggregate, with lineage cut per round (an
  * unchecked 5-deep iterative lineage replans and re-executes the
  * whole prefix on any task retry; at cluster scale you'd use
  * reliable checkpointing to survive executor loss, localCheckpoint
  * is the single-JVM equivalent). Rank state stays (node, double) —
  * ~16 bytes/node, orders smaller than the edge list.
  */
object PageRank {

  /** Ranks after `iterations` damped power steps; columns
    * (nodeCol, "pr"), pr UNrounded (callers round for cross-engine
    * hashing). Edges are taken as given — dedup/self-loop policy is
    * the caller's.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      damping: Double = 0.85,
      iterations: Int = 5
  ): DataFrame = runImpl(edges, srcCol, dstCol, damping, iterations, prePartitioned = false)

  // --- Persisted, incrementally-maintained edge state (round 8): the
  // q87 index-maintenance story applied to graphs. The edge list is
  // written ONCE as a table bucketed by src (the per-iteration join
  // key), daily deltas APPEND raw edge observations preserving the
  // bucket layout, and [[runFromEdgeTable]] re-runs the fixed
  // iterations with the edge side contributing ZERO exchange: the
  // observation dedup, the outdegree aggregate and the weighted join
  // all ride the stored bucketing (HashPartitioning(src) satisfies
  // every src-prefixed clustering requirement downstream). At 100 TB
  // the graph outlives any one ranking run, so the bucket shuffle is
  // paid at ingest and amortized over every re-rank after every crawl
  // append — not re-paid per run as run()'s repartition is.

  /** Build + persist the bucketed (src, dst) edge table. Raw edge
    * OBSERVATIONS are stored (duplicates across appended batches are
    * fine); [[edgesFromTable]] dedups exchange-free at read time —
    * dedup-at-write would force each append to re-read the table.
    */
  def writeEdgeTable(edges: DataFrame, table: String, numBuckets: Int): Unit = {
    val spark = edges.sparkSession
    // clean slate incl. orphan files, resolved through the catalog
    // (the writeSignatureIndex rationale — see Dedup.scala)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // repartition BY THE BUCKET FUNCTION (hash(src) mod numBuckets)
    // before the write: this IS the one-shot ingest shuffle the table
    // amortizes, and it leaves each task holding exactly one bucket —
    // one file per bucket instead of tasks × buckets small files
    // (bucketed writes otherwise emit a file per (task, bucket), and
    // the read side pays the file count on every re-rank)
    Formats.writeBucketed(
      edges.select(col("src"), col("dst")).repartition(numBuckets, col("src")),
      table,
      "src",
      numBuckets
    )
  }

  /** Append a batch of edge observations, preserving the bucket layout
    * (the bucket count is read from the catalog; Spark refuses a
    * mismatched spec).
    */
  def appendEdgeTable(edges: DataFrame, table: String): Unit = {
    val spark = edges.sparkSession
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    val numBuckets = meta.bucketSpec
      .map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(s"edge table '$table' is not bucketed"))
    edges
      .select(col("src"), col("dst"))
      .repartition(numBuckets, col("src")) // one file per bucket per append
      .write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .option("maxRecordsPerFile", graft.sources.Formats.MaxRecordsPerFile.toString)
      .format("parquet")
      .bucketBy(numBuckets, "src")
      .sortBy("src")
      .saveAsTable(table)
    // r15: per-crawl-append file growth bounded by the shared
    // relative-threshold compaction (no-op below it)
    compactEdgeTable(spark, table)
  }

  /** Shared small-files maintenance for the persisted edge table
    * (Formats.compactBucketed contract). Returns true iff a rewrite
    * ran.
    */
  def compactEdgeTable(
      spark: SparkSession,
      table: String,
      maxFilesPerBucket: Int = graft.sources.Formats.DefaultCompactFilesPerBucket
  ): Boolean =
    graft.sources.Formats.compactBucketed(spark, table, maxFilesPerBucket)

  /** The deduped edge frame off the bucketed table — exchange-free:
    * the (src, dst) distinct's clustering requirement is satisfied by
    * the stored HashPartitioning(src) (same-src rows, hence same
    * (src, dst) rows, are already co-located). Asserted in GraphSpec.
    */
  def edgesFromTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table).groupBy(col("src"), col("dst")).agg(count(lit(1)).as("__obs")).drop("__obs")

  /** [[run]] over the persisted bucketed edge table, reusing the
    * stored src-partitioning instead of re-paying run()'s repartition.
    */
  def runFromEdgeTable(
      spark: SparkSession,
      table: String,
      damping: Double = 0.85,
      iterations: Int = 5
  ): DataFrame =
    runImpl(edgesFromTable(spark, table), "src", "dst", damping, iterations, prePartitioned = true)

  private def runImpl(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      damping: Double,
      iterations: Int,
      prePartitioned: Boolean
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    import spark.implicits._

    val src = col(srcCol)
    // materialize the edge derivation ONCE: deg, the weighted join's
    // probe side, and both union branches of nodes all read it — an
    // unchecked plan would re-execute the caller's derivation (for
    // q97: a fact-table window + distinct) four times
    val edgesC = edges.select(src.as("src"), col(dstCol).as("dst")).localCheckpoint()
    // the per-iteration join key is src: partition the (src, dst,
    // outdeg) frame by it once, cut lineage, reuse every round —
    // UNLESS the caller's frame is already src-partitioned (bucketed
    // edge table), where a repartition would re-pay the shuffle the
    // persisted layout exists to amortize
    val deg = edgesC.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesW0 = edgesC
      .join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
    val edgesW = (if (prePartitioned) edgesW0 else edgesW0.repartition(col("src"))).localCheckpoint()
    val nodes = edgesC
      .select(col("src").as("node"))
      .union(edgesC.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "PageRank on an empty edge list")
    val base = (1.0 - damping) / n

    // in-loop checkpoints are LAZY: they still cut lineage (each
    // round's plan reads the previous round's RDD, not the whole
    // prefix) but materialize inside the next round's job instead of
    // paying one extra eager job per iteration (~30% of q97's wall
    // time at sf0.1 was those launches)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr")).localCheckpoint(false)
    for (_ <- 1 to iterations) {
      val contrib = edgesW
        .join(ranks, ranks("node") === edgesW("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("outdeg").cast("double")).as("contrib"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"), (lit(base) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("pr"))
        .localCheckpoint(false)
    }
    ranks
  }
}
