package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.functions.GraftFunctions

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("graft_dot matches dotFold and dotUnrolled bit-exactly") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 64).map(d => math.sin(i * 64 + d) * 3.7).toArray)
    }
    val df = vecs.toDF("id", "v")
    val cross = df.as("a").join(df.as("b"), col("a.id") < col("b.id") && col("b.id") < col("a.id") + 3)
    val cmp = cross
      .select(
        GraftFunctions.dot(col("a.v"), col("b.v")).as("native"),
        Dedup.dotFold(col("a.v"), col("b.v")).as("folded"),
        Dedup.dotUnrolled(col("a.v"), col("b.v"), 64).as("unrolled")
      )
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) == java.lang.Double.doubleToLongBits(r.getDouble(1)) &&
          java.lang.Double.doubleToLongBits(r.getDouble(0)) == java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"bit mismatch: ${r.getDouble(0)} / ${r.getDouble(1)} / ${r.getDouble(2)}"
      )
    }
  }

  test("graft_dot is callable from SQL via the session extension") {
    import spark.implicits._
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("dot_in")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_in").head.getDouble(0)
    assert(r == 11.0)
    // null array propagates null
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), b) AS d FROM dot_in").head
    assert(n.isNullAt(0))
  }
}
