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
}
