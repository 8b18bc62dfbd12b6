package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.PageRank
import graft.search.Bm25Index
import graft.sim.Similarity
import graft.sources.{Formats, Tables}

/** Round 15: the CellIndex r14 compaction generalized to EVERY
  * persisted index family (r14 verdict #3 — q87 signature bands, q104
  * edge table, q117 BM25 postings+stats, q107 IVF, q125 IVF+PQ were
  * still growing one file per key per append batch with no ceiling).
  * Per family: answers unchanged, stamps preserved verbatim, layout
  * restored, idempotent below the relative threshold. Plus the two
  * r14-advice semantics shared by all of them: the RELATIVE trigger
  * (a bucket legitimately holding several MaxRecordsPerFile splits
  * must not re-trigger a full rewrite every batch) and the
  * rename-aside crash recovery.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.documents(spark, sf).limit(300).localCheckpoint()

  private def fileCount(table: String): Int = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) 0
    else fs.listStatus(loc).count(s => s.isFile && s.getPath.getName.startsWith("part-"))
  }

  private def props(table: String): Map[String, String] = spark.sessionState.catalog
    .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    .properties
    .filter { case (k, _) => k.startsWith("graft.") && k != Formats.CompactedFilesProp }

  test("q87 signature index: append-grown files compact with answers, version stamp, and bucket layout intact") {
    val T = "graft_cmp_sig_idx"
    val d = docs
    val sh = Dedup.dfCapped(Dedup.shingles(d, "doc_id", "text", 3), 50).localCheckpoint()
    val sigs = Dedup.minhashSignatures(sh, 16).localCheckpoint()
    val parts = (0 until 3).map(i => sigs.filter(pmod(col("doc_id"), lit(3)) === i))
    Dedup.writeSignatureIndex(parts(0), T, 16, 4, 8)
    val stampsBefore = props(T)
    parts.drop(1).foreach(p => Dedup.appendSignatureIndex(p, T, 16, 4))
    val grown = fileCount(T)
    val before = Dedup
      .readSignatureIndex(spark, T)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(Dedup.compactSignatureIndex(spark, T, maxFilesPerBucket = 1), "grown files must trigger")
    assert(fileCount(T) < grown && fileCount(T) <= 8, s"layout not restored: ${fileCount(T)} files")
    val after = Dedup
      .readSignatureIndex(spark, T)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(after.toSeq == before.toSeq, "compaction changed the band rows")
    assert(props(T) == stampsBefore, "compaction must preserve the version stamp verbatim")
    // bucket layout still declared (Spark refuses a mismatched append)
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(T))
    assert(meta.bucketSpec.exists(_.numBuckets == 8))
    assert(!Dedup.compactSignatureIndex(spark, T, maxFilesPerBucket = 1), "compacted layout must be left alone")
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("q117 BM25 index: postings AND the per-batch stats table compact; search answers unchanged") {
    val T = "graft_cmp_bm25_idx"
    val d = docs
    val parts = (0 until 4).map(i => d.filter(pmod(col("doc_id"), lit(4)) === i))
    Bm25Index.writeIndex(parts(0), "doc_id", "text", T, 8)
    parts.drop(1).foreach(p => Bm25Index.appendIndex(p, "doc_id", "text", T))
    // appendIndex already compacts past the default threshold; force
    // the tight threshold for a deterministic trigger here
    val searchBefore = Bm25Index
      .search(spark, T, Seq((1, Seq("the", "data", "alpha"))), 10)
      .collect()
      .map(_.toString)
      .sorted
    val grownPost = fileCount(T)
    val ran = Bm25Index.compactIndex(spark, T, maxFilesPerBucket = 1)
    if (grownPost > 8) assert(ran, "grown postings must trigger")
    assert(fileCount(T) <= 8)
    assert(fileCount(s"${T}_stats") <= 1, "stats companion must compact to one file")
    val searchAfter = Bm25Index
      .search(spark, T, Seq((1, Seq("the", "data", "alpha"))), 10)
      .collect()
      .map(_.toString)
      .sorted
    assert(searchAfter.toSeq == searchBefore.toSeq, "compaction changed BM25 scores")
    assert(!Bm25Index.compactIndex(spark, T, maxFilesPerBucket = 1))
    Seq(T, s"${T}_stats").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("q104 edge table: compaction preserves the dedup-at-read answers and the src bucketing") {
    val T = "graft_cmp_edge_tbl"
    val edges = Tables
      .events(spark, sf)
      .select(pmod(col("user_id"), lit(50)).as("src"), pmod(col("event_id"), lit(50)).as("dst"))
      .limit(2000)
      .localCheckpoint()
    val parts = (0 until 3).map(i => edges.filter(pmod(col("dst"), lit(3)) === i))
    PageRank.writeEdgeTable(parts(0), T, 8)
    parts.drop(1).foreach(p => PageRank.appendEdgeTable(p, T))
    val before = PageRank.edgesFromTable(spark, T).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val grown = fileCount(T)
    assert(PageRank.compactEdgeTable(spark, T, maxFilesPerBucket = 1) || grown <= 8)
    assert(fileCount(T) <= 8)
    val after = PageRank.edgesFromTable(spark, T).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(after.toSeq == before.toSeq, "compaction changed the deduped edge set")
    assert(!PageRank.compactEdgeTable(spark, T, maxFilesPerBucket = 1))
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("q107 IVF / q125 IVF+PQ partitioned layouts: per-cell files compact, answers and pruning layout unchanged") {
    import graft.operators.KMeans
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val probes = e.filter(col("vec_id") < 5)
    def pathFiles(path: String): Int = {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(root)) 0
      else {
        val it = fs.listFiles(root, true)
        var n = 0
        while (it.hasNext) if (it.next().getPath.getName.startsWith("part-")) n += 1
        n
      }
    }
    // IVF
    val ivfPath = "target/graft_cmp_ivf_idx"
    val base = e.filter(col("vec_id") < 400)
    val cents = Similarity.ivfCentroids(base, 16).localCheckpoint()
    Similarity.writeIvfIndex(cents, base, ivfPath)
    (0 until 3).foreach { i =>
      Similarity.appendIvfIndex(cents, e.filter(col("vec_id") >= 400 && pmod(col("vec_id"), lit(3)) === i), ivfPath)
    }
    val beforeIvf = Similarity
      .ivfTopKFromIndex(spark, ivfPath, cents, probes, 10, 2)
      .collect()
      .map(_.toString)
      .sorted
    val grown = pathFiles(ivfPath)
    assert(Formats.compactPartitioned(spark, ivfPath, Seq("cent_id"), 1) || grown <= 16)
    assert(pathFiles(ivfPath) <= 16, s"IVF layout not restored: ${pathFiles(ivfPath)} files")
    val afterIvf = Similarity
      .ivfTopKFromIndex(spark, ivfPath, cents, probes, 10, 2)
      .collect()
      .map(_.toString)
      .sorted
    assert(afterIvf.toSeq == beforeIvf.toSeq, "IVF compaction changed answers")
    assert(!Formats.compactPartitioned(spark, ivfPath, Seq("cent_id"), 1))
    // IVF+PQ
    val pqPath = "target/graft_cmp_ivfpq_idx"
    val q = KMeans.quantizeShifted(e, "vec_id", "v").localCheckpoint()
    val qBase = q.filter(col("vec_id") < 400)
    Similarity.writeIvfPqIndex(qBase, 8, 8, 8, 16, pqPath)
    (0 until 3).foreach { i =>
      Similarity.appendIvfPqIndex(qBase, q.filter(col("vec_id") >= 400 && pmod(col("vec_id"), lit(3)) === i), 8, 8, 8, 16, pqPath)
    }
    val codesBefore = spark.read.parquet(pqPath).collect().map(_.toString).sorted
    assert(Formats.compactPartitioned(spark, pqPath, Seq("cell"), 1) || pathFiles(pqPath) <= 8)
    val codesAfter = spark.read.parquet(pqPath).collect().map(_.toString).sorted
    assert(codesAfter.toSeq == codesBefore.toSeq, "IVF+PQ compaction changed the stored codes")
    assert(!Formats.compactPartitioned(spark, pqPath, Seq("cell"), 1))
  }

  test("the relative trigger does NOT re-compact forever once buckets legitimately hold several files") {
    // r14 advice (medium): with maxRecordsPerFile a compacted bucket
    // can hold >threshold files, and the old ABSOLUTE trigger then
    // re-ran the full-table rewrite on every ingest batch. The
    // relative trigger compares against the count the LAST compaction
    // produced, so a post-compact state never re-triggers without
    // fresh appends — simulated here by stamping a floor ABOVE the
    // absolute threshold and asserting no rewrite runs.
    val T = "graft_cmp_trigger_tbl"
    val d = docs
    val sh = Dedup.dfCapped(Dedup.shingles(d, "doc_id", "text", 3), 50).localCheckpoint()
    val sigs = Dedup.minhashSignatures(sh, 16).localCheckpoint()
    Dedup.writeSignatureIndex(sigs, T, 16, 4, 2)
    // pretend the last compaction ALREADY produced this many files
    // (the multi-split-bucket regime): current files <= floor + 1*2
    val n = fileCount(T)
    spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('${Formats.CompactedFilesProp}' = '$n')")
    assert(
      !Formats.compactBucketed(spark, T, maxFilesPerBucket = 1),
      "a freshly-compacted multi-file layout must not re-trigger (the r14 infinite-rewrite defect)"
    )
    // and the stamp updates after a REAL compaction: clear the floor,
    // grow the table, compact, then verify the recorded count equals
    // the live one
    spark.sql(s"ALTER TABLE $T UNSET TBLPROPERTIES IF EXISTS ('${Formats.CompactedFilesProp}')")
    Dedup.appendSignatureIndex(sigs.filter(col("doc_id") % 2 === 0), T, 16, 4)
    if (fileCount(T) > 2) {
      assert(Formats.compactBucketed(spark, T, maxFilesPerBucket = 1))
      val recorded = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(T))
        .properties(Formats.CompactedFilesProp)
        .toInt
      assert(recorded == fileCount(T), "the compacted-files stamp must record the achieved count")
    }
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }

  test("an interrupted swap recovers by ONE rename, never a rebuild") {
    val T = "graft_cmp_crash_tbl"
    val d = docs
    val sh = Dedup.dfCapped(Dedup.shingles(d, "doc_id", "text", 3), 50).localCheckpoint()
    val sigs = Dedup.minhashSignatures(sh, 16).localCheckpoint()
    Dedup.writeSignatureIndex(sigs, T, 16, 4, 4)
    val before = Dedup.readSignatureIndex(spark, T).count()
    // simulate a crash between rename-aside and rename-in: the table
    // name is gone, the aside twin holds the complete data
    spark.sql(s"ALTER TABLE $T RENAME TO ${T}_compact_old")
    assert(Formats.recoverInterruptedCompaction(spark, T), "the aside twin must be restored")
    assert(Dedup.readSignatureIndex(spark, T).count() == before, "recovery must restore the full table")
    assert(!spark.catalog.tableExists(s"${T}_compact_old"))
    assert(!Formats.recoverInterruptedCompaction(spark, T), "recovery is idempotent")
    spark.sql(s"DROP TABLE IF EXISTS $T")
  }
}
