package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class EntrySpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query has rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key corresponds to a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("the flagship entry runs and returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0, "entry must return rows at sf0.001")
  }

  test("q01_agg aggregates correctly") {
    val df = SparkEntry.queries("q01_agg")(spark, sf)
    assert(df.columns.sorted.toSeq == Seq("l_linestatus", "l_returnflag", "n_rows", "revenue", "sum_qty"))
    val total = df.agg(org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0)
    assert(total == 6000L)
  }
}
