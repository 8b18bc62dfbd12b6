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

  test("graft_lshbuckets equals the per-plane sign fold bit-exactly, and nulls drop the vector") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val dims = 64
    val tables = 8
    val planes = 12
    val stride = 20
    val mat = graft.sim.Similarity.lshPlaneMatrix(tables, planes, dims, stride)
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until dims).map(d => math.cos(i * dims + d) * 2.3))
    }
    val df = vecs.toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    // reference: the round-10 Column fold (per-plane graft_dot + when)
    val foldBuckets = (0 until tables).map { t =>
      (0 until planes)
        .map { j =>
          val w = lit(graft.sim.Similarity.hyperplane(t * stride + j, dims).toArray)
          when(GraftFunctions.dot(col("v"), w) > 0, shiftleft(lit(1), j)).otherwise(lit(0))
        }
        .reduce((a, b) => a.bitwiseOR(b))
        .cast("long")
        .as(s"f$t")
    }
    val rows = df
      .select(col("id") +: GraftFunctions.lshBuckets(col("v"), mat, planes).as("nb") +: foldBuckets: _*)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val native = r.getSeq[Long](1)
      (0 until tables).foreach { t =>
        assert(native(t) == r.getLong(2 + t), s"id ${r.getLong(0)} table $t: ${native(t)} != ${r.getLong(2 + t)}")
      }
    }
    // a null element / length mismatch yields a NULL array (the
    // declared contract: degenerates drop from the index instead of
    // colliding into bucket 0 of every table)
    val degen = Seq(
      (0L, Seq[java.lang.Double](1.0, null)),
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0))
    ).toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    val out = degen.select(GraftFunctions.lshBuckets(col("v"), mat, planes).as("b")).collect()
    assert(out.forall(_.isNullAt(0)), "degenerate vectors must yield NULL bucket arrays")
  }

  test("graft_dist2i / graft_doti equal the unrolled integer trees exactly (incl. null/mismatch contracts)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val dims = 64
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i => (i.toLong, Seq.fill(dims)(rnd.nextInt(255).toLong)))
    val df = vecs.toDF("id", "q")
    val cross = df
      .select(col("id"), col("q"))
      .as("a")
      .join(df.select(col("id").as("id2"), col("q").as("q2")).as("b"), col("id") < col("id2") && col("id2") < col("id") + 4)
    val unrolledD2 = (1 to dims).map { i =>
      val d = element_at(col("q"), i) - element_at(col("q2"), i)
      d * d
    }.reduce(_ + _)
    val shift = graft.operators.KMeans.Shift
    val unrolledDot = (1 to dims)
      .map(i => (element_at(col("q"), i) - shift) * (element_at(col("q2"), i) - shift))
      .reduce(_ + _)
    val rows = cross
      .select(
        GraftFunctions.dist2i(col("q"), col("q2")).as("nd2"),
        unrolledD2.as("ud2"),
        GraftFunctions.dotiShifted(col("q"), col("q2"), shift).as("ndot"),
        unrolledDot.as("udot")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"dist2: ${r.getLong(0)} != ${r.getLong(1)}")
      assert(r.getLong(2) == r.getLong(3), s"doti: ${r.getLong(2)} != ${r.getLong(3)}")
    }
    // null element / length mismatch → NULL (the DotProduct contract)
    val degen = Seq(
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 2L))
    ).toDF("a", "b")
    val d = degen
      .select(GraftFunctions.dist2i(col("a"), col("b")).as("x"), GraftFunctions.dotiShifted(col("a"), col("b"), 0).as("y"))
      .collect()
    assert(d.forall(r => r.isNullAt(0) && r.isNullAt(1)), "degenerate inputs must yield NULL")
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

  test("graft_strhash2 matches the reference fold and is SQL-callable") {
    import graft.functions.PortableHash
    GraftFunctions.ensureRegistered(spark)
    // reference fold, written independently of the production loop
    def ref(s: String): Long = {
      val cps = s.codePoints().toArray
      def fold(base: Long) = cps.foldLeft(0L)((acc, c) => (acc * base + c) % PortableHash.P)
      fold(31) * 2147483648L + fold(37)
    }
    for (s <- Seq("", "a", "the quick brown fox", "x" * 500, "naïve café")) {
      val got = spark.sql(s"SELECT graft_strhash2('${s.replace("'", "''")}') AS h").head.getLong(0)
      assert(got == ref(s), s"hash mismatch for '$s'")
      assert(got >= 0, "hash must be non-negative (62-bit)")
    }
  }

  test("graft_minhash equals per-permutation min over the same arithmetic") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val hs = Seq(5L, 999999937L, (1L << 61) + 17L, 0L)
    val got = hs
      .toDF("h")
      .agg(GraftFunctions.minhash(col("h"), 8).as("mh"))
      .head
      .getSeq[Long](0)
    import graft.functions.PortableHash.{perm, permA, permB, permC}
    val want = (0 until 8).map(p => hs.map(h => perm(permA(p), permB(p), permC(p), h)).min)
    assert(got == want, s"$got != $want")
  }

  test("graft_sigmatch counts equal slots and matches the interpreted formulation") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)), // 3 matches
      (Seq(0L, 0L), Seq(0L, 0L)), // all match
      (Seq(5L), Seq(6L)) // none
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.sigmatch(col("a"), col("b")).as("m")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 2, 0), s"sigmatch gave $got")
    val interp = df
      .select(expr("size(filter(zip_with(a, b, (x, y) -> x = y), m -> m))").as("m"))
      .collect()
      .map(_.getInt(0))
      .toSeq
    assert(got == interp, "native kernel diverges from the interpreted formulation")
    // defensive null semantics: width mismatch is a pipeline bug -> null
    val mismatch = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    assert(mismatch.select(GraftFunctions.sigmatch(col("a"), col("b"))).head.isNullAt(0))
  }

  test("graft_simhash votes per bit with ties resolving to 0") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    // two inputs: bit 0 set in both -> vote +2 -> 1; bit 1 set in one
    // of two -> tie 0 -> 0; bit 2 set in neither -> -2 -> 0
    val sig = Seq(3L, 1L).toDF("h").agg(GraftFunctions.simhash(col("h"))).head.getLong(0)
    assert(sig == 1L, s"expected 1, got $sig")
    // single input reproduces its own low 60 bits
    val h = (1L << 59) | 0x5aL
    val one = Seq(h).toDF("h").agg(GraftFunctions.simhash(col("h"))).head.getLong(0)
    assert(one == h, s"single-row simhash must echo the hash: $one != $h")
  }

  test("graft_min2 equals a reference top-2-distinct-id scan under randomized keys, ties, and duplicates") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val M = Long.MaxValue
    val rnd = new scala.util.Random(42)
    // groups of varied size incl. 1 and 2; duplicate ids with better/
    // worse keys; key ties broken by id (lexicographic (key, id))
    val rows = (0 until 4000).map { i =>
      (i % 37L, rnd.nextInt(25).toLong, rnd.nextInt(9).toLong + 1) // (grp, key, id)
    } ++ Seq((100L, 7L, 3L), (101L, 5L, 4L), (101L, 5L, 2L), (101L, 9L, 2L))
    val got = rows
      .toDF("g", "k", "id")
      .groupBy(col("g"))
      .agg(GraftFunctions.min2(col("k"), col("id")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
      .toMap
    val ref = rows.groupBy(_._1).map { case (g, rs) =>
      // reference: best entry per distinct id, then the two smallest
      // (key, id) pairs lexicographically
      val best = rs
        .groupBy(_._3)
        .valuesIterator
        .map(es => es.map(e => (e._2, e._3)).min)
        .toSeq
        .sorted
      val top = best.take(2)
      g -> (top.flatMap { case (k, i) => Seq(k, i) } ++ Seq(M, M, M, M)).take(4).toList
    }
    assert(got.keySet == ref.keySet)
    got.foreach { case (g, m) => assert(m == ref(g), s"group $g: $m != ${ref(g)}") }
    // merge path: force partial aggregation across many partitions
    val wide = rows.toDF("g", "k", "id").repartition(16)
    val merged = wide
      .groupBy(col("g"))
      .agg(GraftFunctions.min2(col("k"), col("id")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
      .toMap
    assert(merged == got, "partial-aggregate merge path diverges from the single-pass result")
  }

  test("graft_minkp equals graft_min2 on packed distinct-id inputs and plans as a hash aggregate") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val M = Long.MaxValue
    val rnd = new scala.util.Random(7)
    // distinct ids per group (the KMeans precondition: a centroid id
    // appears at most once per vector), packed key = k * 2^8 + id
    val rows = (0 until 3000).flatMap { g =>
      rnd.shuffle((1L to 9L).toList).take(1 + rnd.nextInt(9)).map(id => (g.toLong, rnd.nextInt(25).toLong, id))
    } ++ Seq((9001L, 7L, 3L)) // singleton group: later slots stay sentinel
    val df = rows.toDF("g", "k", "id").withColumn("p", col("k") * 256 + col("id")).repartition(16)
    val got = df
      .groupBy(col("g"))
      .agg(GraftFunctions.minkp(col("p"), 2).as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
      .toMap
    val viaMin2 = df
      .groupBy(col("g"))
      .agg(GraftFunctions.min2(col("k"), col("id")).as("m"))
      .collect()
      .map { r =>
        val m = r.getSeq[Long](1)
        val p1 = if (m(0) == M) M else m(0) * 256 + m(1)
        val p2 = if (m(2) == M) M else m(2) * 256 + m(3)
        r.getLong(0) -> List(p1, p2)
      }
      .toMap
    assert(got == viaMin2, "packed declarative top-2 diverges from the typed distinct-id aggregate")
    // general K against a reference scan, exercising update AND merge
    // (repartition forces partial aggregation)
    for (k <- Seq(1, 3, 5)) {
      val gotK = df
        .groupBy(col("g"))
        .agg(GraftFunctions.minkp(col("p"), k).as("m"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
        .toMap
      val refK = rows
        .groupBy(_._1)
        .map { case (g, rs) =>
          val sorted = rs.map(e => e._2 * 256 + e._3).sorted
          g -> (sorted.take(k).toList ++ List.fill(k)(M)).take(k)
        }
      assert(gotK.keySet == refK.keySet)
      gotK.foreach { case (g, m) => assert(m == refK(g), s"k=$k group $g: $m != ${refK(g)}") }
    }
    // the whole point: the declarative K-long buffer must plan into
    // HashAggregate (ObjectHashAggregate's 128-key fallback sorts the
    // entire fan-out — the r15 722 GB build spill)
    val plan =
      df.groupBy(col("g")).agg(GraftFunctions.minkp(col("p"), 3)).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate, plan:\n$plan")
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"), s"fallback-prone plan:\n$plan")
  }
}
