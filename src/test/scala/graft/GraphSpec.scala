package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank
import graft.queries.GraphQueries

/** Iterative-graph posture: the q104 persisted edge table must make
  * incremental maintenance answer-invisible (append-then-rank equals
  * rebuild-then-rank) while the edge side of the computation rides the
  * stored bucketing with zero exchange — the q87 pair of guarantees,
  * applied to PageRank.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  private val tbl = "graft_edge_table_spec"

  test("append-then-rank equals rebuild-then-rank (and equals the in-memory run)") {
    val base = GraphQueries.partEdges(spark, sf, col("l_orderkey") % 5 =!= 0)
    val delta = GraphQueries.partEdges(spark, sf, col("l_orderkey") % 5 === 0)
    val full = GraphQueries.partEdges(spark, sf)

    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select(col("node"), round(col("pr"), 7).as("pr"))
        .collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
        .toMap

    // incremental: base write + delta append
    PageRank.writeEdgeTable(base, tbl, 4)
    PageRank.appendEdgeTable(delta, tbl)
    val appended = ranks(PageRank.runFromEdgeTable(spark, tbl, 0.85, 3))
    // the appended table's deduped edge set is exactly the full derivation
    val storedEdges = PageRank
      .edgesFromTable(spark, tbl)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val fullEdges = full.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedEdges == fullEdges, "append lost or invented edges")
    // rebuild: one-shot write of the full set
    PageRank.writeEdgeTable(full, tbl, 4)
    val rebuilt = ranks(PageRank.runFromEdgeTable(spark, tbl, 0.85, 3))
    assert(appended == rebuilt, "append-then-rank diverged from rebuild-then-rank")
    // and both equal the non-persisted run (round-7 contract absorbs
    // partitioning-order ulps, as with the q97 oracle)
    val direct = ranks(PageRank.run(full, "src", "dst", 0.85, 3))
    assert(appended == direct, "bucketed path diverged from the in-memory run")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("the edge side of the maintained rank rides the bucketing with zero exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    PageRank.writeEdgeTable(GraphQueries.partEdges(spark, sf, col("l_orderkey") % 5 =!= 0), tbl, 4)
    PageRank.appendEdgeTable(GraphQueries.partEdges(spark, sf, col("l_orderkey") % 5 === 0), tbl)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the three edge-side stages runImpl builds before iterating:
      // observation dedup, outdegree aggregate, weighted src-join —
      // all must plan WITHOUT a shuffle over the bucketed scan
      val edges = PageRank.edgesFromTable(spark, tbl)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val weighted = edges.join(deg, "src").select(col("src"), col("dst"), col("outdeg"))
      Seq("dedup" -> edges, "outdegree" -> deg, "weighted-join" -> weighted).foreach { case (name, df) =>
        val p = df.queryExecution.executedPlan
        val shuffles = p.collect { case e: ShuffleExchangeLike => e }
        assert(shuffles.isEmpty, s"$name stage shuffles the bucketed edge table:\n$p")
        assert(p.toString.contains("Bucketed: true"), s"$name stage does not read the bucketed layout:\n$p")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("appending to a non-bucketed table is refused") {
    import spark.implicits._
    val plain = Seq((1L, 2L)).toDF("src", "dst")
    spark.sql("DROP TABLE IF EXISTS graft_edge_plain_spec")
    plain.write.format("parquet").saveAsTable("graft_edge_plain_spec")
    val ex = intercept[IllegalStateException] {
      PageRank.appendEdgeTable(plain, "graft_edge_plain_spec")
    }
    assert(ex.getMessage.contains("not bucketed"))
    spark.sql("DROP TABLE IF EXISTS graft_edge_plain_spec")
  }
}
