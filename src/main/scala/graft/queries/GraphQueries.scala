package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PageRank
import graft.sources.Tables

/** Graph analytics over derived link structure. Beyond the reference's
  * surface (its only graph-shaped op is adjacency dissolve, covered by
  * q10/q88): a crawl-scale training pipeline weights documents by
  * link authority (PageRank-family quality priors), and this exercises
  * the engine's iterative-computation posture — per-round lineage
  * cuts, a reused src partitioning, rank state orders smaller than
  * the edge list (see operators/PageRank.scala).
  */
object GraphQueries {

  /** Damped power-iteration rounds; fixed so the result is
    * exact-comparable across engines, not convergence-dependent.
    */
  val PrIterations = 5
  val PrDamping = 0.85

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q97: part co-occurrence PageRank — each part links to the NEXT
    // part in its order's line sequence (the co-supply "citation"
    // graph); 5 damped power steps rank parts by centrality. Edge
    // derivation is ONE lead() window — a single shuffle of the fact
    // table, where a (orderkey, linenumber+1) self-join would shuffle
    // it twice; per-order partitions are ≤7 rows, so the window is
    // skew-free. Each iteration is join + aggregate on the
    // checkpointed src-partitioned edge frame.
    "q97_link_pagerank" -> { (s, dir) =>
      // linenumbers are NOT unique per order in this corpus — the
      // partkey tiebreak makes the sequence (and so the edge set)
      // total and engine-independent
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = Tables
        .lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst_part", lead(col("l_partkey"), 1).over(w))
        .filter(col("dst_part").isNotNull && col("l_partkey") =!= col("dst_part"))
        .select(col("l_partkey").as("src"), col("dst_part").as("dst"))
        .distinct()
      PageRank
        .run(edges, "src", "dst", PrDamping, PrIterations)
        .select(col("node"), round(col("pr"), 7).as("pr"))
    }
  )

  /** The oracle unrolls the fixed iteration count as chained CTEs —
    * identical double arithmetic to the Spark loop (literals CAST to
    * DOUBLE so DuckDB doesn't run them as DECIMAL; the base term is
    * written `(1 - d)/n` in BOTH engines so even its representation
    * error matches). round(,7) absorbs summation-order ulps.
    */
  private def pagerankOracleSql: String = {
    val d = s"CAST($PrDamping AS DOUBLE)"
    val iters = (1 to PrIterations)
      .map { t =>
        s"""r$t AS (
           |  SELECT n.node, (CAST(1 AS DOUBLE) - $d) / nn.n + $d * coalesce(c.contrib, CAST(0 AS DOUBLE)) AS pr
           |  FROM nodes n CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.dst, sum(p.pr / CAST(e.outdeg AS DOUBLE)) AS contrib
           |    FROM ew e JOIN r${t - 1} p ON p.node = e.src
           |    GROUP BY e.dst) c ON c.dst = n.node)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH li AS (
       |  SELECT l_partkey,
       |         lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst_part
       |  FROM lineitem),
       |edges AS (
       |  SELECT DISTINCT l_partkey AS src, dst_part AS dst
       |  FROM li WHERE dst_part IS NOT NULL AND l_partkey <> dst_part),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |ew AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON d.src = e.src),
       |r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT node, round(pr, 7) AS pr FROM r$PrIterations""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q97_link_pagerank" -> pagerankOracleSql
  )
}
