package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Formats, Tables}

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows and types under an explicit schema") {
    val nation = Tables.nation(spark, sf)
    val dir = tmpDir("graft_csv")
    Formats.writeCsv(nation, dir)
    val back = Formats.readCsv(spark, dir, nation.schema)
    assert(back.schema == nation.schema)
    assert(back.count() == nation.count())
    val a = nation.orderBy("n_nationkey").collect().toSeq
    val b = back.orderBy("n_nationkey").collect().toSeq
    assert(a == b)
  }

  test("JSONL round-trip preserves rows under an explicit schema") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val dir = tmpDir("graft_jsonl")
    Formats.writeJsonl(docs, dir)
    val back = Formats.readJsonl(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    assert(
      back.agg(sum("n_chars")).head.getLong(0) == docs.agg(sum("n_chars")).head.getLong(0)
    )
  }

  test("ORC round-trip preserves rows and pushes filters into the ORC scan") {
    val cust = Tables.customer(spark, sf)
    val dir = tmpDir("graft_orc")
    Formats.writeOrc(cust, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.schema == cust.schema)
    assert(back.count() == cust.count())
    // every graft operator must run on ORC inputs unchanged: pushdown
    // and pruning reach the ORC reader like parquet
    val filtered = back.filter(col("c_custkey") < 100).select("c_custkey", "c_acctbal")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,100)"), s"no ORC pushdown:\n$plan")
    assert(!plan.contains("c_mktsegment"), "ORC scan not pruned to selected columns")
    assert(filtered.count() == cust.filter(col("c_custkey") < 100).count())
  }

  test("FAILFAST CSV ingest rejects corrupt rows instead of nulling them") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft_bad_csv")
    Files.writeString(java.nio.file.Paths.get(dir, "bad.csv"), "id,n\n1,2\nnot_a_number,x\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("n", LongType)))
    val ex = intercept[org.apache.spark.SparkException] {
      Formats.readCsv(spark, dir, schema).collect()
    }
    assert(ex.getMessage.contains("Malformed") || ex.getCause != null)
  }

  test("bucketed tables join without any shuffle") {
    // clean slate: DROP leaves files behind if a prior run died mid-write
    Seq("bk_cust", "bk_ord").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val left = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
    val right = Tables.orders(spark, sf).select(col("o_custkey"), col("o_totalprice"))
    Formats.writeBucketed(left, "bk_cust", "c_custkey", 8)
    Formats.writeBucketed(right.withColumnRenamed("o_custkey", "c_custkey"), "bk_ord", "c_custkey", 8)
    val joined = spark.table("bk_cust").join(spark.table("bk_ord"), "c_custkey")
    // correctness
    assert(joined.count() == left.join(right, left("c_custkey") === right("o_custkey")).count())
    // the join must co-locate on bucket files: a sort-merge join with
    // NO shuffle exchange on either side (disable AQE/broadcast so the
    // planner can't sidestep the bucketed path on this tiny input)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = spark.table("bk_cust").join(spark.table("bk_ord"), "c_custkey").queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge bucketed join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("persisted layouts pin files-per-key: one file per bucket / per partition dir") {
    // a stored index's file count is a CONTRACT — it must not inherit
    // the session's shuffle width (AQE initialPartitionNum plans 8x
    // fine). Feed a deliberately over-partitioned frame and assert the
    // layout collapses to one file per bucket (bucketBy) and one file
    // per directory (partitionBy).
    spark.sql("DROP TABLE IF EXISTS bk_layout")
    val loc = new java.io.File("spark-warehouse/bk_layout")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    val wide = spark.range(1000).toDF("id").withColumn("v", col("id") * 2).repartition(23)
    Formats.writeBucketed(wide, "bk_layout", "id", 4)
    val bucketFiles = new java.io.File("spark-warehouse/bk_layout")
      .listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    assert(bucketFiles.length == 4, s"expected 1 file per bucket (4), got ${bucketFiles.length}")
    assert(spark.table("bk_layout").count() == 1000)

    val dir = tmpDir("graft_layout_part")
    Formats.writePartitioned(wide.withColumn("g", col("id") % 3), dir, Seq("g"))
    (0 until 3).foreach { g =>
      val files = new java.io.File(s"$dir/g=$g")
        .listFiles()
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      assert(files.length == 1, s"expected 1 file in g=$g, got ${files.length}")
    }
  }

  test("partitioned parquet writes prune partitions on read") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_returnflag")
    val dir = tmpDir("graft_part")
    Formats.writePartitioned(li, dir, Seq("l_returnflag"))
    val back = Formats.readPartitioned(spark, dir).filter(col("l_returnflag") === "R")
    // correctness: same rows as filtering the unpartitioned source
    assert(back.count() == li.filter(col("l_returnflag") === "R").count())
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), s"no partition pruning in:\n$plan")
  }

  test("range-sorted parquet skips row groups on narrow key filters; unsorted reads everything") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // rows the scan node actually EMITS — with parquet min/max stats,
    // row groups whose key range misses the filter are never read
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
        .sum
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // sf0.01 (~60k rows): with 64 KB row groups each output file
      // spans several groups, so the skip is visible at row-group (not
      // just file) granularity — at production block sizes the same
      // mechanics apply per 128 MB group
      val li = Tables.lineitem(spark, "/root/testdata/sf0.01").select("l_orderkey", "l_extendedprice")
      val total = li.count()
      val sortedDir = tmpDir("graft_sorted")
      Formats.writeSorted(li, sortedDir, "l_orderkey", blockBytes = 64 * 1024)
      val shuffledDir = tmpDir("graft_shuffled")
      // same data, key order destroyed: every row group's min/max
      // spans ~the whole key domain, nothing can skip
      li.repartition(4, col("l_extendedprice")).write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString).parquet(shuffledDir)
      // genuinely narrow: ~0.3% of the key domain
      val pred = col("l_orderkey").between(100, 140)
      val expect = li.filter(pred).count()
      val sortedScan = scanRows(spark.read.parquet(sortedDir).filter(pred))
      val shuffledScan = scanRows(spark.read.parquet(shuffledDir).filter(pred))
      // correctness first: both layouts return identical answers
      assert(spark.read.parquet(sortedDir).filter(pred).count() == expect)
      assert(spark.read.parquet(shuffledDir).filter(pred).count() == expect)
      // the layout claim: sorted emits a small multiple of the selected
      // rows (only the straddling row groups), unsorted emits ~all rows
      assert(sortedScan < total / 10, s"sorted layout did not skip: scan emitted $sortedScan of $total rows")
      assert(shuffledScan > total / 2, s"shuffled layout unexpectedly skipped: $shuffledScan of $total")
      assert(sortedScan < shuffledScan / 5, s"sorted ($sortedScan) not ≪ shuffled ($shuffledScan)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
