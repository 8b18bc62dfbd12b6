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
    // q97: part co-occurrence PageRank — parts adjacent by linenumber
    // within an order form a directed edge (the co-supply "citation"
    // graph); 5 damped power steps rank parts by centrality. The
    // edge derivation is one self-equi-join on (orderkey, succ
    // linenumber); each iteration is join + aggregate on the
    // checkpointed src-partitioned edge frame.
    "q97_link_pagerank" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val nxt = li.select(
        col("l_orderkey"),
        (col("l_linenumber") - 1).as("l_linenumber"),
        col("l_partkey").as("dst_part")
      )
      val edges = li
        .join(nxt, Seq("l_orderkey", "l_linenumber"))
        .filter(col("l_partkey") =!= col("dst_part"))
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
    s"""WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem),
       |edges AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b
       |    ON b.l_orderkey = a.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
       |  WHERE a.l_partkey <> b.l_partkey),
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
