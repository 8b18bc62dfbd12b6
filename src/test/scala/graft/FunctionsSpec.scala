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

  test("the optimizer rewrites aggregate(zip_with(...)) dot products to graft_dot") {
    // non-literal input: a foldable source would be constant-folded
    // into a LocalRelation before the rewrite can be observed
    val base = spark
      .range(3)
      .select(
        col("id"),
        transform(sequence(lit(1), lit(4)), i => i.cast("double") + col("id")).as("a"),
        transform(sequence(lit(1), lit(4)), i => i.cast("double") * 2 + col("id")).as("b")
      )
    val df = base.select(col("id"), Dedup.dotFold(col("a"), col("b")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")
    // id=0: a=[1,2,3,4], b=[2,4,6,8] -> 1*2+2*4+3*6+4*8 = 60
    assert(df.orderBy("id").head.getDouble(1) == 60.0)
    // a non-matching fold (different seed) must NOT be rewritten
    val other = base
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0), (acc, x) => acc + x).as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(other.orderBy("d").head.getDouble(0) == 61.0)
  }

  test("graft_dot is callable from SQL via the session extension") {
    import spark.implicits._
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("dot_in")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_in").head.getDouble(0)
    assert(r == 11.0)
    // null array propagates null
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), b) AS d FROM dot_in").head
    assert(n.isNullAt(0))
    // interpreted-fold parity: length mismatch and null elements -> null
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d)) AS d").head.isNullAt(0))
    assert(spark.sql("SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS d").head.isNullAt(0))
  }
}
