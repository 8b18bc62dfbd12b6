package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OrderStatistic

/** The distributed exact k-th order statistic (the k-means seed-cutoff
  * machinery): histogram narrowing must agree with a local sort on
  * every id-space shape the engine meets — dense, sparse/strided
  * (ScaleUp replicas), adversarially clustered, duplicated — and at
  * the rank edges.
  */
class OrderStatisticSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(values: Seq[Long], ks: Seq[Long]): Unit = {
    val df = values.toDF("id")
    val sorted = values.sorted
    ks.foreach { k =>
      val got = OrderStatistic.kthSmallest(df, "id", k)
      assert(got == sorted((k - 1).toInt), s"k=$k over ${values.size} values: got $got, want ${sorted((k - 1).toInt)}")
      // and again with caps tiny enough to FORCE multi-round histogram
      // narrowing (the production caps only enter the loop past 65536
      // rows — the fast path hid a double-typed bucket id that first
      // detonated at the 128× scaling point; never again)
      val narrowed = OrderStatistic.kthSmallest(df, "id", k, buckets = 16L, collectCap = 32L)
      assert(narrowed == sorted((k - 1).toInt), s"narrowed k=$k: got $narrowed, want ${sorted((k - 1).toInt)}")
    }
  }

  test("agrees with a local sort on dense, strided, clustered and duplicated id spaces") {
    val rnd = new scala.util.Random(42)
    // dense 0..n-1 (the driver corpora)
    check((0L until 5000L).toSeq, Seq(1L, 2L, 63L, 64L, 2500L, 4999L, 5000L))
    // the ScaleUp shape: dense runs of 2000 at a 1e9 stride
    val strided = (0 until 5).flatMap(r => (0L until 2000L).map(_ + r * 1000000000L))
    check(strided, Seq(1L, 2000L, 2001L, 3125L, 9999L, 10000L))
    // adversarial clustering: everything in one narrow band far from 0
    check((0 until 3000).map(i => 7_000_000_000L + rnd.nextInt(500)), Seq(1L, 1500L, 3000L))
    // duplicates: multiset rank semantics
    check(Seq(5L, 5L, 5L, 1L, 9L, 9L), Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // one value repeated past the remnant cap would still be exact
    check(Seq.fill(300)(77L) ++ Seq(1L, 99L), Seq(1L, 2L, 301L, 302L))
    // random longs (non-negative, full spread)
    val rand = Seq.fill(4000)(math.abs(rnd.nextLong()) % (Long.MaxValue / 8))
    check(rand, Seq(1L, 7L, 1234L, 4000L))
  }

  test("production caps: the histogram loop actually runs past 65536 rows") {
    // the 128× shape at production Buckets/CollectCap — the loop the
    // small-input tests skip must run and agree with the local sort
    val ids = (0 until 5).flatMap(r => (0L until 40000L).map(_ * 3L + r * 1000000000L))
    val df = ids.toDF("id")
    val sorted = ids.sorted
    Seq(1L, 64000L, 128001L, ids.size.toLong).foreach { k =>
      val got = OrderStatistic.kthSmallest(df, "id", k)
      assert(got == sorted((k - 1).toInt), s"k=$k: got $got, want ${sorted((k - 1).toInt)}")
    }
  }

  test("narrowing terminates below the collect cap and rejects bad ranks loudly") {
    val df = (0L until 100L).toDF("id")
    assert(OrderStatistic.kthSmallest(df, "id", 100L) == 99L)
    val tooBig = intercept[IllegalArgumentException](OrderStatistic.kthSmallest(df, "id", 101L))
    assert(tooBig.getMessage.contains("exceeds"), tooBig.getMessage)
    val zero = intercept[IllegalArgumentException](OrderStatistic.kthSmallest(df, "id", 0L))
    assert(zero.getMessage.contains("k >= 1"), zero.getMessage)
  }

  test("the k-means seed prefix built from the cutoff is exactly the k smallest ids") {
    // the call-site contract: unique ids => filter(id <= kth) has k rows
    val ids = (0 until 4000).map(i => i.toLong * 105L + 17L)
    val df = ids.toDF("id")
    Seq(1L, 64L, 3125L, 4000L).foreach { k =>
      val cut = OrderStatistic.kthSmallest(df, "id", k)
      val seeds = df.filter($"id" <= cut).collect().map(_.getLong(0)).toSet
      assert(seeds == ids.sorted.take(k.toInt).toSet, s"seed prefix wrong at k=$k")
    }
  }
}
