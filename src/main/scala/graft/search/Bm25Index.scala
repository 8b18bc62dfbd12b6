package graft.search

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Persisted BM25 retrieval index — the q87/q107 "pay one shuffle at
  * ingest, amortize it over every query" story applied to text search.
  *
  * The index is the classic inverted file: one postings row per
  * (token, doc) with the term frequency AND the document length
  * denormalized in, written as a managed table BUCKETED BY token.
  * Because a search's term set is a driver-known literal (it IS the
  * query), the postings read carries an `isin` filter on the bucket
  * column and Spark prunes whole buckets — a query touches the file
  * groups its terms hash into, not the corpus
  * (SelectedBucketsCount asserted in SearchSpec). Every statistic BM25
  * needs at query time is then derivable from what the pruned read
  * returns plus O(batches) rows of side metadata:
  *
  *   - tf, dl: on the postings row itself;
  *   - df(t): count of postings for t — complete because the read
  *     returns ALL of a matched token's postings;
  *   - n_docs, sum_dl: from the `<table>_stats` companion table, one
  *     row per ingest batch, summed at query time (never a corpus
  *     scan).
  *
  * Scoring uses q76's rational-idf BM25 (k1 = 1.2, b = 0.75; idf =
  * (N - df + 0.5)/(df + 0.5), no libm) with one boundary hardening:
  * each per-term score is converted to integer BASIS POINTS
  * (round(s·10⁴) as BIGINT) BEFORE the per-(query, doc) sum, so the
  * accumulated score is an order-free integer and the (score_bp DESC,
  * doc_id ASC) ranking is bit-deterministic under any partitioning —
  * the fp-sum-order caveat documented on tfidfCosinePairs cannot
  * arise here.
  *
  * Incremental maintenance mirrors [[graft.dedup.Dedup]]'s signature
  * index: [[appendIndex]] appends a daily batch's postings preserving
  * the bucket layout (Spark refuses a mismatched spec) and appends one
  * stats row; SearchSpec asserts append-then-search ≡
  * rebuild-then-search. A format-version table property gates reads:
  * changing the tokenizer or scoring constants bumps
  * [[FormatVersion]] and a stale index fails loudly instead of
  * returning silently wrong scores.
  *
  * Reference anchor: the reference has no search surface; this extends
  * q76 (document top-terms) to the retrieval direction a training
  * pipeline needs for eval-set decontamination lookups and
  * "find the docs about X" curation audits.
  */
object Bm25Index {

  /** Bump when the tokenizer regex or scoring constants change: an
    * index built under another version must not serve queries.
    */
  val FormatVersion = 1

  val VersionProp = "graft.bm25_format_version"

  /** q76's tokenizer — the two must stay identical or q76-calibrated
    * relevance judgments stop transferring to the index.
    */
  val TokenPattern = "[a-z0-9]+"

  private def statsTable(table: String) = s"${table}_stats"

  /** Postings rows (token, doc_id, tf, dl) for a document batch. dl is
    * denormalized into every posting so query-time scoring never joins
    * a doc-keyed side table (which would shuffle on doc_id — the key
    * the bucketing deliberately does NOT use).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(expr(s"regexp_extract_all(lower($textCol), '$TokenPattern', 0)")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, "doc_id").select(col("token"), col("doc_id"), col("tf"), col("dl"))
  }

  /** Build + persist the bucketed postings table and its one-row stats
    * companion, stamped with [[FormatVersion]]. Clean-slate handling
    * (catalog drop + orphan-directory delete through the catalog's
    * default path) follows Dedup.writeSignatureIndex.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String, table: String, numBuckets: Int): Unit = {
    val spark = docs.sparkSession
    Seq(table, statsTable(table)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
      val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val post = postings(docs, idCol, textCol)
    Formats.writeBucketed(post, table, "token", numBuckets)
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('$VersionProp' = '$FormatVersion')")
    batchStats(post).write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(statsTable(table))
  }

  /** Append a batch: version gate FIRST, postings appended under the
    * stored bucket spec, one stats row appended. Doc ids must be
    * disjoint from prior batches (the ingest contract everywhere in
    * this codebase) — df/n_docs arithmetic double-counts otherwise.
    */
  def appendIndex(docs: DataFrame, idCol: String, textCol: String, table: String): Unit = {
    val spark = docs.sparkSession
    readIndex(spark, table) // loud format/version gate
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    val numBuckets = meta.bucketSpec
      .map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(s"bm25 index '$table' is not bucketed"))
    val post = postings(docs, idCol, textCol)
    // one file per bucket per append batch (see Formats.writeBucketed)
    post
      .repartition(numBuckets, col("token"))
      .write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", Formats.MaxRecordsPerFile.toString)
      .format("parquet")
      .bucketBy(numBuckets, "token")
      .sortBy("token")
      .saveAsTable(table)
    batchStats(post).write.mode(SaveMode.Append).format("parquet").saveAsTable(statsTable(table))
    // r15: postings grow one file per bucket per batch, stats one file
    // per batch — both bounded by the shared relative-threshold
    // compaction (no-op below it; see Formats.compactBucketed)
    compactIndex(spark, table)
  }

  /** Shared small-files maintenance for the postings table and its
    * stats companion. The stats rewrite is answer-invisible because
    * the reader only ever aggregates the batch rows (sum/count) —
    * coalescing files changes neither. Returns true iff either
    * rewrite ran.
    */
  def compactIndex(
      spark: SparkSession,
      table: String,
      maxFilesPerBucket: Int = Formats.DefaultCompactFilesPerBucket
  ): Boolean = {
    val postingsRan = Formats.compactBucketed(spark, table, maxFilesPerBucket)
    val statsRan = Formats.compactPlain(spark, statsTable(table), maxFilesPerBucket)
    postingsRan || statsRan
  }

  private def batchStats(post: DataFrame): DataFrame =
    post
      .groupBy(col("doc_id"))
      .agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** Open a persisted index, refusing a format-version mismatch
    * (metadata-only check).
    */
  def readIndex(spark: SparkSession, table: String): DataFrame = {
    val props = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties
    val v = props.get(VersionProp)
    require(
      v.contains(FormatVersion.toString),
      s"bm25 index '$table' has format version ${v.getOrElse("<none>")}, expected $FormatVersion — rebuild it"
    )
    spark.table(table)
  }

  /** Top-k BM25 retrieval for a literal query set. `queries` is
    * (query_id, terms) — driver-known by nature (it IS the search
    * request), which is what lets the term filter be an `isin` of
    * literals the bucketed scan can prune on. Candidate docs per query
    * are bounded by Σ df(term): the pruned postings, never the corpus.
    * The per-query ranking window sorts only those candidates (at the
    * retrieval extreme — a stopword query over 100 TB — the window
    * would be replaced by the graft_topk bounded heap, q99-style; for
    * literal curation queries the candidate frame is small by
    * construction).
    */
  def search(spark: SparkSession, table: String, queries: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(queries.nonEmpty, "queries must be non-empty")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val q = queries
      .flatMap { case (qid, terms) => terms.distinct.map(t => (qid, t)) }
      .toDF("query_id", "token")
    val idx = readIndex(spark, table).filter(col("token").isin(allTerms: _*))
    // ONE pruned read feeds both df and the scoring join: bucket
    // pruning happens at the scan, then the frame is tiny.
    val matched = idx.localCheckpoint()
    val dfreq = matched.groupBy(col("token")).agg(count(lit(1)).as("df")) // postings unique per (token, doc)
    val stats = spark
      .table(statsTable(table))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score_bp").desc, col("doc_id").asc)
    matched
      .join(broadcast(q), "token")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn(
        "s",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
      )
      // integer basis points BEFORE the sum: order-free accumulation,
      // bit-deterministic ranking (see object doc)
      .withColumn("bp", round(col("s") * lit(10000), 0).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("bp")).as("score_bp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_bp"))
  }

  /** The same retrieval computed directly from a document frame with
    * no persisted state — the acceptance reference for the index path
    * (SearchSpec asserts byte-equality) and the one-shot form for
    * ad-hoc use.
    */
  def searchDirect(docs: DataFrame, idCol: String, textCol: String, queries: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries
      .flatMap { case (qid, terms) => terms.distinct.map(t => (qid, t)) }
      .toDF("query_id", "token")
    // DISK_ONLY checkpoint default (r19): the corpus postings frame is
    // corpus-PROPORTIONAL (one row per (token, doc) — ~5 GB of
    // deserialized rows at the 512× decade, more than the whole heap
    // at 2048×) and re-read only three times (df, stats, scoring). A
    // MEMORY_AND_DISK attempt at residency drained the shared pool's
    // unroll side while 32 concurrent scan tasks asked for aggregate
    // maps — HashAggregate.createHashMap refused 256 KB and the 512×
    // fusion probe died twice at 32 cores (r18) and once more after
    // the scoring-aggregate bound (r19). Disk-backed residency costs
    // one serialized write + three reads of a frame this code was
    // about to materialize anyway; SPARK_GRAFT_CKPT_LEVEL still
    // overrides for A/Bs.
    val post = graft.dedup.Dedup
      .checkpointHeavy(postings(docs, idCol, textCol), org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // df restricted to the QUERY's tokens before the forced broadcast
    // (r17): the corpus-wide per-token df frame scales with vocabulary
    // — at the 512× decade broadcasting it exhausted execution memory
    // (AGGREGATE_OUT_OF_MEMORY in an unrelated stage) — while only
    // tokens surviving the q join can reach the score. The semi-join
    // keeps df values identical for every token that matters; the
    // index-path `search` gets the same effect from its isin-pruned
    // scan.
    val dfreq = post
      .join(broadcast(q.select(col("token")).distinct()), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df")) // postings unique per (token, doc)
    val stats = post
      .groupBy(col("doc_id"))
      .agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score_bp").desc, col("doc_id").asc)
    post
      .join(broadcast(q), "token")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn(
        "s",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
      )
      .withColumn("bp", round(col("s") * lit(10000), 0).cast("long"))
      // Scoring-aggregate state bound (r19, the r18 fusion OOMs): a
      // query-by-example probe carries a document's FULL token set, so
      // nearly every doc sharing any term is a candidate — the
      // (query_id, doc_id) sum's per-task partial maps scale with
      // corpus × probes on the postings frame's inherited coarse
      // partitions (two 32-core OOMs at the 512× fusion probe). One
      // skinny exchange on the aggregate keys at the postings-size-
      // proportional width bounds keys/task, dedup-aggregate style;
      // it satisfies the aggregate's required distribution, so no
      // second shuffle is planned, and the basis-point sum is
      // order-free so results are bit-identical under any
      // partitioning. Width from the CHECKPOINTED postings frame —
      // the scored join's own multiply-path stats are garbage.
      .repartition(graft.dedup.Dedup.clusterWidth(post), col("query_id"), col("doc_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("bp")).as("score_bp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_bp"))
  }
}
