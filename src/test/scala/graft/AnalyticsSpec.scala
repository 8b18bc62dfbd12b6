package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("as-of join picks the latest prior right row, ties included") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "ts_us", "pid")
    val right = Seq((1L, 100L, 7L), (1L, 150L, 8L), (1L, 999L, 9L))
      .toDF("user_id", "ts_us", "click_id")
    val out = AsOfJoin
      .latestPriorMatch(left, right, "user_id", "ts_us", Seq("click_id"))
      .collect()
      .map(r => r.getString(2) -> (if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(out("p1") == 7L) // tie at ts 100 matches (<=)
    assert(out("p2") == 8L) // latest prior, not the later 999
    assert(out("p3") == -1L) // no right rows for user 2
  }

  test("q42/q43 cover every purchase/error exactly once") {
    val q42 = SparkEntry.queries("q42_asof_join")(spark, sf)
    val nPurchases = graft.sources.Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(q42.count() == nPurchases)
    assert(q42.select("purchase_id").distinct().count() == nPurchases)
    // matched clicks never come after the purchase
    assert(q42.filter(col("click_ts_us") > col("p_ts_us")).count() == 0)

    val q43 = SparkEntry.queries("q43_range_join")(spark, sf)
    val nErrors = graft.sources.Tables.events(spark, sf).filter(col("event_type") === "error").count()
    assert(q43.count() == nErrors)
    assert(q43.filter(col("n_in_window") < 0).count() == 0)
  }

  test("stratified sample keeps roughly the configured per-stratum rates") {
    val s44 = SparkEntry.queries("q44_stratified_sample")(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val byLang = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s44.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.foreach { case (lang, k) =>
      val rate = k.toDouble / byLang(lang)
      val target = if (lang == "en") 0.5 else 0.2
      assert(math.abs(rate - target) < 0.15, s"$lang rate $rate far from $target")
    }
  }

  test("discrete quantiles are actual elements and ordered") {
    val q = SparkEntry.queries("q45_quantile_disc")(spark, sf).collect()
    q.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("quantile sketch bands bracket every exact rank at two SFs") {
    // the invariant Quantiles.exactDiscrete rests on: the approximate
    // band [lo, hi] per (group, target) must contain the exact rank's
    // value (below < k <= below + in-band). Violations would surface
    // as NULL quantiles; assert zero here at sf0.001 and sf0.01
    // (sf0.1 is covered end-to-end by the oracle gate), plus a tiny
    // frame exercising n=1 / all-equal / two-value groups.
    import graft.operators.Quantiles
    import graft.queries.AnalyticsQueries.{QuantileNames, QuantileProbs}
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val base = graft.sources.Tables.lineitem(spark, dir).select(col("l_returnflag"), col("l_extendedprice"))
      assert(
        Quantiles.bracketViolations(base, "l_returnflag", "l_extendedprice", QuantileProbs) == 0,
        s"bracket violated at $dir"
      )
    }
    // the scale contract itself: the refine window never sorts more
    // than max(small-group limit, ~2·delta·n + slop) rows per
    // (group, target) — the quantity that must stay bounded at 100 TB
    val big = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val counts = big.groupBy("l_returnflag").count().agg(max("count"), min("count")).head
    val (nMax, nMin) = (counts.getLong(0), counts.getLong(1))
    // every sf0.01 flag group is comfortably on the sketch path, so
    // the TIGHT bound applies (no SmallGroupLimit escape hatch) — a
    // delta/accuracy regression that regrows the sorted band fails
    // here, not in a cluster run. Measured widest: 42 rows at sf0.01,
    // 405 at sf0.1, vs 2·delta·n of 40 / 400.
    assert(nMin >= Quantiles.SmallGroupLimit, "fixture groups must exercise the sketch path")
    val bandCap = (4 * Quantiles.DefaultDelta * nMax).toLong + 8
    val widest = Quantiles.maxBandRows(big, "l_returnflag", "l_extendedprice", QuantileProbs)
    assert(widest <= bandCap, s"refine band $widest exceeds sketch-path cap $bandCap")
    // empty input: the diagnostic must report 0, not NPE
    assert(Quantiles.maxBandRows(big.filter(lit(false)), "l_returnflag", "l_extendedprice", QuantileProbs) == 0L)
    import spark.implicits._
    val edge = Seq(("a", 1.0), ("b", 2.0), ("b", 2.0), ("b", 2.0), ("c", 1.0), ("c", 9.0)).toDF("g", "v")
    assert(Quantiles.bracketViolations(edge, "g", "v", QuantileProbs) == 0)
    val out = Quantiles
      .exactDiscrete(edge, "g", "v", QuantileProbs, QuantileNames)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("a") == ((1L, 1.0, 1.0, 1.0)))
    assert(out("b") == ((3L, 2.0, 2.0, 2.0)))
    // n=2: ranks floor(p*1)+1 = (1, 1, 1) -> all p target the minimum
    assert(out("c") == ((2L, 1.0, 1.0, 1.0)))
    // totality: wide frames whose extra columns collide with internal
    // names (n) and NULL values (excluded from ranks and from n)
    val wide = Seq(("a", Option(1.0), 9L), ("a", Option(2.0), 9L), ("a", Option(3.0), 9L), ("a", None, 9L))
      .toDF("g", "v", "n")
    val wq = Quantiles.exactDiscrete(wide, "g", "v", QuantileProbs, QuantileNames).head
    assert(wq.getLong(1) == 3L, "NULL value must not count toward n")
    assert((wq.getDouble(2), wq.getDouble(3), wq.getDouble(4)) == ((1.0, 2.0, 2.0)))
    assert(Quantiles.bracketViolations(wide, "g", "v", QuantileProbs) == 0)
  }

  test("cube emits all four grouping levels consistently") {
    val c = SparkEntry.queries("q46_cube")(spark, sf)
    val byGid = c.groupBy("gid").agg(sum("n_rows").as("rows")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every level partitions the same 6000 lineitem rows
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    byGid.values.foreach(v => assert(v == 6000L))
  }

  test("salted join matches the plain join on skewed data") {
    import spark.implicits._
    import graft.operators.SkewJoin
    // 90% of facts hit one key — the shape AQE split can't fully fix
    val facts = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 999L, i.toLong)).toDF("k", "payload")
    val dim = (0L to 999L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = facts.join(dim, "k")
    val salted = SkewJoin.saltedJoin(facts, dim, "k", saltFactor = 8, factSaltCols = Seq("payload"))
    assert(salted.count() == plain.count())
    val a = plain.orderBy("k", "payload").collect().toSeq
    val b = salted.select(plain.columns.map(col): _*).orderBy("k", "payload").collect().toSeq
    assert(a == b)
    // the degenerate-salt diagnostic: payload varies within the hot
    // key (999), so its rows must spread over >1 salt — while salting
    // on a constant-within-key column must show the degenerate 1
    val spread = SkewJoin.saltSpread(facts, "k", 8, Seq("payload"), topKeys = 1, fraction = 1.0).head
    assert(spread.getLong(0) == 999L && spread.getAs[Long]("n_salts") > 1)
    val degenerate = SkewJoin.saltSpread(facts, "k", 8, Seq("k"), topKeys = 1, fraction = 1.0).head
    assert(degenerate.getAs[Long]("n_salts") == 1L)
  }

  test("approx sketches stay within error bounds of the exact answers at two SFs") {
    // q57's sketch gate is oracle-checked since round 8 (the booleans
    // must hash-compare TRUE); this spec keeps the RAW-estimate bound
    // at two SFs — every group's approx distinct and median within 5%
    // relative error of the exact answers (~9 HLL standard errors,
    // ~25x the KLL rank error: loose enough to never flake, tight
    // enough to catch a broken sketch or a swapped column) — and
    // asserts the query's own booleans and exact columns agree with a
    // direct computation.
    import graft.sources.Tables
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val out = SparkEntry.queries("q57_approx_stats")(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4), r.getBoolean(5))))
        .toMap
      val li = Tables.lineitem(spark, dir)
      val exact = li.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          countDistinct("l_orderkey").as("d"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("hll"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("kll"),
          expr("percentile(l_extendedprice, 0.5)").as("m")
        )
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      assert(out.keySet == exact.keySet, s"group sets diverge at $dir")
      exact.foreach { case (flag, (n, d, hll, kll, m)) =>
        val (qn, qd, qMed, hllOk, kllOk) = out(flag)
        assert(qn == n && qd == d, s"$dir $flag exact columns diverge")
        assert(hllOk && kllOk, s"$dir $flag sketch gate boolean false")
        // the query's discrete median and the interpolating exact
        // median agree within the bound (they differ by ≤1 rank)
        assert(math.abs(qMed - m) / m <= 0.05, s"$dir $flag median column off: $qMed vs $m")
        assert(math.abs(hll - d).toDouble / d <= 0.05, s"$dir $flag distinct: approx $hll vs exact $d")
        assert(math.abs(kll - m) / m <= 0.05, s"$dir $flag median: approx $kll vs exact $m")
      }
    }
  }

  test("q79 histogram buckets partition the rows and bound their values") {
    import graft.queries.AnalyticsQueries.HistBucketCenti
    val out = SparkEntry.queries("q79_histogram")(spark, sf).cache()
    val rows = graft.sources.Tables.lineitem(spark, sf).count()
    assert(out.agg(sum(col("n"))).head.getLong(0) == rows, "histogram counts must sum to the row count")
    // bucket bounds stay inside the bucket's value range
    val width = HistBucketCenti / 100.0
    val bad = out
      .filter(
        col("bucket_min") < col("bucket") * width ||
          col("bucket_max") >= (col("bucket") + 1) * width ||
          col("bucket_min") > col("bucket_max")
      )
      .count()
    assert(bad == 0, s"$bad buckets with out-of-range bounds")
    out.unpersist()
  }

  test("q83 quantile buckets cover all rows in order, roughly quartile-sized") {
    val out = SparkEntry.queries("q83_quantile_bucket")(spark, sf).cache()
    val rows = graft.sources.Tables.lineitem(spark, sf).count()
    assert(out.agg(sum(col("n"))).head.getLong(0) == rows, "bucket counts must cover every row")
    // consecutive buckets do not overlap in value (threshold is <=, so
    // the next bucket starts strictly above the previous one's max)
    val next = out.select(col("l_returnflag"), (col("bucket") - 1).as("bucket"), col("lo").as("next_lo"))
    assert(out.join(next, Seq("l_returnflag", "bucket")).filter(col("next_lo") <= col("hi")).count() == 0)
    // quartiles: every bucket holds 15-35% of its flag's rows
    val perFlag = out.groupBy(col("l_returnflag")).agg(sum(col("n")).as("flag_n"))
    val offQuartile = out
      .join(perFlag, "l_returnflag")
      .filter(col("n") * 100 < col("flag_n") * 15 || col("n") * 100 > col("flag_n") * 35)
      .count()
    assert(offQuartile == 0, s"$offQuartile buckets far from quartile mass")
    out.unpersist()
  }

  test("q80 column profile is exact per column") {
    val out = SparkEntry.queries("q80_column_profile")(spark, sf).cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    assert(out.count() == 3)
    val rows = orders.count()
    assert(out.filter(col("n_rows") =!= rows).count() == 0)
    // countDistinct semantics (NULL excluded) — distinct().count()
    // would count a NULL row and spuriously fail on a nullable corpus
    val statusDistinct = orders.agg(countDistinct(col("o_orderstatus"))).head.getLong(0)
    val got = out.filter(col("col_name") === "o_orderstatus").head
    assert(got.getAs[Long]("n_distinct") == statusDistinct)
    assert(out.filter(col("n_null") < 0 || col("n_distinct") > col("n_rows")).count() == 0)
    out.unpersist()
  }

  test("vocab top-k is rank-consecutive and above the floor") {
    val v = SparkEntry.queries("q47_vocab_topk")(spark, sf).orderBy("rank").collect()
    assert(v.nonEmpty && v.length <= 100)
    assert(v.map(_.getInt(2).toLong).toSeq == (1L to v.length).toSeq)
    assert(v.forall(_.getLong(1) >= 20))
  }

  test("q96: PSI buckets cover both vintages exactly and the index is non-negative") {
    import graft.queries.AnalyticsQueries.{PsiYearA, PsiYearB}
    val out = SparkEntry.queries("q96_psi_drift")(spark, sf).cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    def yearCount(y: Int): Long = orders.filter(year(col("o_orderdate")) === y).count()
    assert(out.agg(sum(col("n_a"))).head.getLong(0) == yearCount(PsiYearA), "vintage A mass lost")
    assert(out.agg(sum(col("n_b"))).head.getLong(0) == yearCount(PsiYearB), "vintage B mass lost")
    // every per-bucket contribution is non-negative ((p-q) and
    // ln(p/q) always share sign), hence so is the PSI total
    assert(out.filter(col("contrib") < 0.0).count() == 0, "negative PSI contribution")
    // smoothed shares are proper distributions (up to rounding)
    val (pa, pb) = (
      out.agg(sum(col("p_a"))).head.getDouble(0),
      out.agg(sum(col("p_b"))).head.getDouble(0)
    )
    // add-one smoothing reserves mass for unseen buckets, so sums sit
    // at (tot + seen)/(tot + seen) == 1 when every bucket is seen in
    // either vintage — which fixed-width binning over a shared price
    // domain gives us here
    assert(math.abs(pa - 1.0) < 1e-3 && math.abs(pb - 1.0) < 1e-3, s"shares sum to ($pa, $pb)")
    out.unpersist()
  }

  test("q102's bloom probe passes ~only matching fact rows to the semi-join") {
    import graft.functions.GraftFunctions
    import graft.queries.AnalyticsQueries.{BloomBits, BloomDimPriority, BloomHashes}
    import graft.sources.Tables
    GraftFunctions.ensureRegistered(spark)
    val keys = Tables
      .orders(spark, sf)
      .filter(col("o_orderpriority") === BloomDimPriority)
      .select(col("o_orderkey"))
    val bloom = keys.agg(GraftFunctions.bloom(col("o_orderkey"), BloomBits, BloomHashes).as("bf"))
    val fact = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val total = fact.count()
    val matching = fact
      .join(keys.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
      .count()
    val surviving = fact
      .crossJoin(broadcast(bloom))
      .filter(GraftFunctions.bloomContains(col("bf"), col("l_orderkey"), BloomHashes))
      .count()
    // never a false negative: every matching row survives the probe
    assert(surviving >= matching, s"bloom dropped matches: $surviving < $matching")
    // the pruning claim: false positives are a sliver of the fact
    // table (geometry puts fpp well under 1%)
    assert(
      surviving - matching <= total / 100,
      s"bloom barely pruned: $surviving survivors for $matching matches of $total rows"
    )
  }
}
