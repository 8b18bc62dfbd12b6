package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. q56 is the capstone corpus-cleaning pipeline (dedup
    * canonicalization + langid + quality + length gates in one plan).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q56_clean_corpus")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // §2.A q01: groupBy aggregation (pop-table rollup shape).
    // Reference: pl_pop_tables.py loads wide census tables and sums by
    // geography; this is the canonical partial-agg + single-shuffle plan.
    "q01_agg" -> { (s, dir) =>
      Tables
        .lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows")
        )
    }
  ) ++ RelationalQueries.queries ++ GeoTextQueries.queries ++ DedupSimQueries.queries ++
    EventsQueries.queries ++ MultimodalQueries.queries ++ AnalyticsQueries.queries ++
    AuditQueries.queries ++ TrainingQueries.queries ++ GraphQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  ) ++ RelationalQueries.oracle ++ GeoTextQueries.oracle ++ DedupSimQueries.oracle ++
    EventsQueries.oracle ++ MultimodalQueries.oracle ++ AnalyticsQueries.oracle ++
    AuditQueries.oracle ++ TrainingQueries.oracle ++ GraphQueries.oracle
}
