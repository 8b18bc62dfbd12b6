package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan audits: the properties SURVEY §4 promises, asserted on the
  * ACTUAL physical plans rather than trusted from comments. A
  * regression that drops a pushdown or flips a broadcast join to a
  * shuffle fails here, not in a 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q03 pushes filter and projection into the parquet scan") {
    val p = plan("q03_filter_project")
    // plan strings truncate long filter lists — assert on the list head
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), s"no pushed filters in:\n$p")
    // pruned read schema: the 4 selected columns only
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate"), "projection not pruned to selected columns")
    assert(!p.contains("l_extendedprice"), "unused column read")
  }

  test("dim joins broadcast, fact joins do not cartesian") {
    val p2 = plan("q02_join_broadcast")
    assert(p2.contains("BroadcastHashJoin"), "nation/region dims not broadcast")
    val p17 = plan("q17_star_join")
    assert(p17.contains("BroadcastHashJoin"), "star dims not broadcast")
    assert(!p17.contains("CartesianProduct"), "star join degenerated to cartesian")
  }

  test("no operator plan contains a cartesian product except broadcast probe fan-out") {
    // q24/q35 intentionally cross-join a tiny broadcast side (5 rows);
    // everything else must never cartesian.
    val exempt = Set("q24_haversine", "q35_ann_bruteforce")
    SparkEntry.queries.keys.filterNot(exempt).foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name contains a CartesianProduct")
    }
  }

  test("aggregations keep map-side partial aggregation") {
    val p = plan("q01_agg")
    // two HashAggregate nodes (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, "q01 lost partial aggregation")
  }

  test("q61 reads only the columns the redaction needs") {
    val p = plan("q61_pii_redact")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), "q61 scan not pruned to (doc_id, text)")
  }

  test("q67 broadcasts the vocabulary, never shuffles the token stream for the join") {
    val p = plan("q67_oov_rate")
    assert(p.contains("BroadcastHashJoin"), "vocab join not broadcast")
  }

  test("q66 estimates similarity from signatures alone — no document re-scan") {
    // after the signature checkpoint, candidate generation and
    // estimation must run entirely off the materialized sketches: a
    // parquet scan in the plan would mean the shingle pipeline leaked
    // back in (the thing sketch-only estimation exists to avoid)
    val p = plan("q66_minhash_est")
    assert(!p.contains("Scan parquet"), s"q66 re-scans source data:\n$p")
  }

  test("whole-stage codegen covers the dedup hot path") {
    // adaptive plans only materialize codegen stages lazily; disable
    // AQE for the assertion so the wrappers render in the plan string
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // codegen stages render as "*(n) Operator" in compact plan strings
      val p = SparkEntry.queries("q30_dedup_text_exact")(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("*(1)"), s"q30 fell out of codegen:\n$p")
      val p26 = SparkEntry.queries("q26_token_count")(spark, sf).queryExecution.executedPlan.toString
      assert(p26.contains("*(1)"), "q26 fell out of codegen")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
