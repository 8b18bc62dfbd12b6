package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextFunctions

/** Semantic checks for the §2.J training-data curation operators
  * (q61-q67) at sf0.001 — properties the DuckDB hash-compare cannot
  * see (redaction completeness, estimator error bounds, flag mix).
  */
class TrainingSpec extends AnyFunSuite {
  import TestSpark._

  test("q61: redaction removes every PII match and counts the injected ones") {
    val out = SparkEntry.queries("q61_pii_redact")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // every doc_id % 15 == 0 doc carries both an email and a phone
    val both = out.filter(col("doc_id") % 15 === 0)
    assert(both.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    // no doc without injection reports a hit
    val none = out.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 =!= 0)
    assert(none.filter(col("n_emails") + col("n_phones") =!= 0).count() == 0)
    // redacting again is a fixpoint: the redacted text has no matches
    // left (checked via the md5 of a double redaction being unchanged);
    // reuses the production injection recipe so the check cannot drift
    val redactedTwice = graft.queries.TrainingQueries
      .withPii(graft.sources.Tables.documents(spark, sf))
      .select(
        col("doc_id"),
        md5(TextFunctions.redactPii(TextFunctions.redactPii(col("raw")))).as("md5_twice")
      )
    val drift = out
      .join(redactedTwice, "doc_id")
      .filter(col("redacted_md5") =!= col("md5_twice"))
      .count()
    assert(drift == 0, s"$drift docs change under a second redaction pass")
    out.unpersist()
  }

  test("q62: repetition ratios are in range and the flag splits the corpus") {
    val out = SparkEntry.queries("q62_repetition_filter")(spark, sf).cache()
    assert(out.filter(col("dup_ratio") < 0 || col("dup_ratio") >= 1).count() == 0)
    assert(out.filter(col("top_ratio") <= 0 || col("top_ratio") > 1).count() == 0)
    assert(out.filter(col("n_distinct") > col("n_toks")).count() == 0)
    val flagged = out.filter(col("flagged")).count()
    assert(flagged > 0 && flagged < out.count(), s"flag does not split: $flagged of ${out.count()}")
    out.unpersist()
  }

  test("q63: contamination reports eval docs only, with positive overlap") {
    val out = SparkEntry.queries("q63_contamination")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("eval_doc") % 10 =!= 0).count() == 0)
    assert(out.filter(col("n_shared_shingles") < 1 || col("n_train_docs") < 1).count() == 0)
    out.unpersist()
  }

  test("q64: canonical URLs carry no query string or trailing slash and cover all docs") {
    val out = SparkEntry.queries("q64_url_dedup")(spark, sf).cache()
    assert(out.filter(col("canonical_url").contains("?")).count() == 0)
    assert(out.filter(col("canonical_url").endsWith("/")).count() == 0)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val covered = out.agg(sum(col("n_urls"))).head.getLong(0)
    assert(covered == docs, s"url group sizes sum to $covered, expected $docs")
    out.unpersist()
  }

  test("q65: char classes partition the text and gini is in [0, 1)") {
    val out = SparkEntry.queries("q65_char_classes")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("n"))
    val bad = out
      .join(docs, "doc_id")
      .filter(col("n_letters") + col("n_digits") + col("n_spaces") + col("n_other") =!= col("n"))
      .count()
    assert(bad == 0, s"$bad docs where class counts do not sum to length")
    assert(out.filter(col("char_gini") < 0 || col("char_gini") >= 1).count() == 0)
    out.unpersist()
  }

  test("q66: signature-based Jaccard estimate tracks the exact Jaccard") {
    val est = SparkEntry
      .queries("q66_minhash_est")(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    // exact Jaccard for the same pairs (q32 verifies candidates exactly)
    val exact = SparkEntry
      .queries("q32_dedup_minhash_lsh")(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val joined = est.join(exact, Seq("doc_a", "doc_b")).cache()
    assert(joined.count() > 0)
    val meanErr = joined
      .agg(avg(abs(col("est_jaccard") - col("jaccard"))))
      .head
      .getDouble(0)
    // 64 permutations -> per-pair std <= 1/(2*sqrt(64)) = 0.0625
    assert(meanErr <= 0.15, s"mean |estimate - exact| = $meanErr > 0.15")
    joined.unpersist()
  }

  test("q70: keep-all sources keep everything; the coin is deterministic") {
    val out = SparkEntry.queries("q70_source_mixing")(spark, sf).cache()
    val keepAll = out.filter(expr("CAST(substr(source, 4) AS INT) % 4 = 0"))
    assert(keepAll.count() > 0)
    assert(keepAll.filter(col("n_kept") =!= col("n_docs")).count() == 0, "a keep-all source dropped docs")
    assert(out.filter(col("n_kept") > col("n_docs")).count() == 0)
    // deterministic: a second evaluation selects the identical counts
    val again = SparkEntry.queries("q70_source_mixing")(spark, sf)
    assert(out.select("source", "n_kept").except(again.select("source", "n_kept")).count() == 0)
    out.unpersist()
  }

  test("q71: shards respect the token budget modulo one straddling doc") {
    val out = SparkEntry.queries("q71_token_shards")(spark, sf).cache()
    val budget = graft.queries.TrainingQueries.ShardTokenBudget
    val maxDoc = out.agg(max(col("n_toks"))).head.getLong(0)
    val shardTotals = out.groupBy(col("source"), col("shard_id")).agg(sum(col("n_toks")).as("toks"))
    // a shard closes once the cumsum crosses the budget, so it can
    // exceed it by at most the straddling document
    assert(shardTotals.filter(col("toks") > budget + maxDoc).count() == 0)
    // shard ids start at 0 for every source
    assert(out.groupBy("source").agg(min("shard_id").as("m")).filter(col("m") =!= 0).count() == 0)
    out.unpersist()
  }

  test("q111: packing accounting is internally consistent and matches the naive window") {
    import org.apache.spark.sql.expressions.Window
    val L = graft.queries.TrainingQueries.PackSeqTokens
    val out = SparkEntry.queries("q111_seq_pack")(spark, sf).cache()
    assert(out.count() > 0)
    // invariants: the last window is never empty and never overfull,
    // and a doc can only be split if the stream has >1 window
    assert(out.filter(col("tail_pad") >= L || col("tail_pad") < 0).count() == 0)
    assert(out.filter(col("n_seqs") * L < col("total_toks")).count() == 0)
    assert(out.filter(col("split_docs") > col("n_docs")).count() == 0)
    assert(out.filter(col("n_seqs") === 1 && col("split_docs") > 0).count() == 0)
    // ≡ the naive per-source global-sort window (the plan q111 avoids)
    val naive = graft.sources.Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("source"), TextFunctions.tokenCountWs(col("text")).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_toks"),
        sum(
          when(col("n_toks") > 0 && expr(s"(cum - n_toks) DIV $L") =!= expr(s"(cum - 1) DIV $L"), 1L)
            .otherwise(0L)
        ).as("split_docs")
      )
    val joined = out.join(naive.withColumnRenamed("n_docs", "e_docs").withColumnRenamed("total_toks", "e_toks").withColumnRenamed("split_docs", "e_split"), "source")
    assert(
      joined
        .filter(col("n_docs") =!= col("e_docs") || col("total_toks") =!= col("e_toks") || col("split_docs") =!= col("e_split"))
        .count() == 0
    )
    out.unpersist()
  }

  test("q112: linear model scores are the exact weight fold and both classes appear") {
    import graft.queries.TrainingQueries.{QualityBiasBp, QualityKeepBp, QualityWeightsBp}
    val out = SparkEntry.queries("q112_quality_logit")(spark, sf).cache()
    assert(out.filter(col("keep")).count() > 0)
    assert(out.filter(!col("keep")).count() > 0)
    // recompute the fold driver-side from the emitted features — the
    // score column must be exactly bias + Σ w·f, keep exactly ≥ thr
    val feats = QualityWeightsBp.map(_._1)
    out.collect().foreach { r =>
      val expected = QualityBiasBp + QualityWeightsBp.map { case (f, w) => w * r.getLong(r.fieldIndex(f)) }.sum
      assert(r.getLong(r.fieldIndex("score_bp")) == expected, s"doc ${r.getLong(0)}")
      assert(r.getBoolean(r.fieldIndex("keep")) == (expected >= QualityKeepBp), s"doc ${r.getLong(0)}")
    }
    assert(feats.forall(out.columns.contains))
    out.unpersist()
  }

  test("q114: overlap matrix is count-symmetric and bounded by each side's gram total") {
    val out = SparkEntry.queries("q114_source_overlap")(spark, sf).cache()
    assert(out.count() > 0)
    // shared counts are symmetric (the RATIO is not — that's the point)
    val flipped = out.select(
      col("source_a").as("source_b"),
      col("source_b").as("source_a"),
      col("n_shared_grams").as("flip_shared")
    )
    val j = out.join(flipped, Seq("source_a", "source_b"), "full_outer")
    assert(j.filter(col("n_shared_grams").isNull || col("flip_shared").isNull).count() == 0)
    assert(j.filter(col("n_shared_grams") =!= col("flip_shared")).count() == 0)
    assert(out.filter(col("n_shared_grams") > least(col("n_a_grams"), col("n_b_grams"))).count() == 0)
    assert(out.filter(col("share_of_a") < 0 || col("share_of_a") > 1).count() == 0)
    out.unpersist()
  }

  test("q115: heap-selected diverse top-k equals the naive per-source window + global sort") {
    import org.apache.spark.sql.expressions.Window
    import graft.queries.TrainingQueries.{DiverseTopK, DiverseTopN}
    val out = SparkEntry.queries("q115_diverse_topk")(spark, sf)
    val scored = graft.queries.TrainingQueries
      .qualityModelScores(graft.sources.Tables.documents(spark, sf), Seq("source"))
      .select(col("doc_id"), col("source"), col("score_bp"))
    val w = Window.partitionBy(col("source")).orderBy(col("score_bp").desc, col("doc_id").asc)
    val naive = scored
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= DiverseTopK)
      .orderBy(col("score_bp").desc, col("doc_id").asc)
      .limit(DiverseTopN.toInt)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val exp = naive.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == exp, s"diff: ${(got -- exp) ++ (exp -- got)}")
    // the per-source cap actually binds
    assert(out.groupBy("source").count().filter(col("count") > DiverseTopK).count() == 0)
  }

  test("q121: fixed-point IPF weights equal a driver-side recomputation and close in on both marginals") {
    import graft.operators.Ipf.WeightScale
    import graft.queries.TrainingQueries.IpfRounds
    val rows = SparkEntry
      .queries("q121_ipf_mix")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty && rows.values.forall(_._2 > 0))
    // driver-side recomputation under the same integer contract
    var w = rows.map { case (k, (n, _)) => k -> WeightScale }
    val n = rows.map { case (k, (nv, _)) => k -> nv }
    val total = n.values.sum
    val sources = rows.keySet.map(_._1)
    val classes = rows.keySet.map(_._2)
    val (tgtA, tgtB) = (total * WeightScale / sources.size, total * WeightScale / classes.size)
    for (_ <- 1 to IpfRounds) {
      // max(1, ·) mirrors the engine's ≥1 bp clamp (Ipf.scala step —
      // keeps marginals positive under extreme imbalance)
      val margA = sources.toSeq.map(sr => sr -> rows.keys.toSeq.filter(_._1 == sr).map(k => n(k) * w(k)).sum).toMap
      w = w.map { case (k, wv) => k -> math.max(1L, wv * tgtA / margA(k._1)) }
      val margB = classes.toSeq.map(c => c -> rows.keys.toSeq.filter(_._2 == c).map(k => n(k) * w(k)).sum).toMap
      w = w.map { case (k, wv) => k -> math.max(1L, wv * tgtB / margB(k._2)) }
    }
    rows.foreach { case (k, (_, got)) => assert(got == w(k), s"cell $k: $got != ${w(k)}") }
    // the LAST-fitted dimension (the class step) is exact up to floor
    // truncation: each cell under-counts by < n(k), so the marginal
    // sits within Σ n of its target. (Source marginals are mid-cycle
    // IPF state after a class step — no such bound holds for them
    // until convergence, which 2 rounds does not promise.)
    classes.foreach { c =>
      val ks = rows.keys.toSeq.filter(_._2 == c)
      val m = ks.map(k => n(k) * w(k)).sum
      val bound = ks.map(n).sum
      assert(tgtB - m <= bound && m <= tgtB, s"class $c marginal $m vs target $tgtB (bound $bound)")
    }
  }

  test("q116: BPE pair counts equal the brute-force fold over the corpus") {
    val out = SparkEntry.queries("q116_bpe_pair_counts")(spark, sf).collect().map(r => (r.getString(0), r.getLong(1)))
    val texts = graft.sources.Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val brute = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { t =>
      t.trim.split("\\s+").foreach { tok =>
        if (tok.length >= 2) (0 until tok.length - 1).foreach(i => brute(tok.substring(i, i + 2)) += 1L)
      }
    }
    val expected = brute.toSeq.sortBy { case (p, n) => (-n, p) }.take(out.length)
    assert(out.toSeq == expected, s"top pairs differ: ${out.take(5).toSeq} vs ${expected.take(5)}")
  }

  test("q72: chunks tile every document at the configured stride and width") {
    import graft.queries.TrainingQueries.{ChunkStride, ChunkTokens}
    val out = SparkEntry.queries("q72_doc_chunks")(spark, sf).cache()
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select(col("doc_id"), TextFunctions.tokenCountWs(col("text")).cast("long").as("n_toks"))
    val per = out
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("tok_start") + col("n_chunk_toks") - 1).as("last_tok"))
      .join(docs, "doc_id")
      .cache()
    // every token of every doc lands in some chunk, and every doc chunks
    assert(per.count() == docs.count())
    assert(per.filter(col("last_tok") =!= col("n_toks")).count() == 0, "chunks do not cover the token stream")
    // chunk starts advance by exactly the stride; widths never exceed the window
    assert(out.filter((col("tok_start") - 1) % ChunkStride =!= 0).count() == 0)
    assert(out.filter(col("n_chunk_toks") > ChunkTokens || col("n_chunk_toks") < 1).count() == 0)
    // overlap: consecutive chunks of a doc share window - stride tokens
    assert(
      per.filter(col("n_chunks") > 1).count() > 0,
      "test corpus has no multi-chunk doc — widen the corpus or shrink the window"
    )
    per.unpersist()
    out.unpersist()
  }

  test("q73: the representative is a real group member with the group max length") {
    val out = SparkEntry.queries("q73_argmax_rep")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    // rep_doc exists in its group and carries rep_chars = max n_chars
    val joined = out.join(
      docs.select(col("doc_id").as("rep_doc"), col("source"), col("lang"), col("n_chars")),
      Seq("rep_doc", "source", "lang")
    )
    assert(joined.count() == out.count(), "a representative is not a member of its group")
    assert(joined.filter(col("n_chars") =!= col("rep_chars")).count() == 0)
    // ties break to the SMALLEST doc_id among max-length docs
    val minTied = docs
      .groupBy(col("source"), col("lang"), col("n_chars"))
      .agg(min(col("doc_id")).as("min_tied"))
      .withColumnRenamed("n_chars", "rep_chars")
    assert(out.join(minTied, Seq("source", "lang", "rep_chars")).filter(col("rep_doc") =!= col("min_tied")).count() == 0)
    out.unpersist()
  }

  test("q76: BM25 ranks are dense per doc and scores decrease down the ranking") {
    val out = SparkEntry.queries("q76_bm25")(spark, sf).cache()
    assert(out.count() > 0)
    // <= 3 rows per doc, ranks exactly 1..n_rows
    val per = out.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
    assert(per.filter(col("n") > 3 || col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
    // scores are non-increasing in rank within a doc
    val r1 = out.filter(col("rank") === 1).select(col("doc_id"), col("score").as("s1"))
    val r2 = out.filter(col("rank") === 2).select(col("doc_id"), col("score").as("s2"))
    assert(r1.join(r2, "doc_id").filter(col("s2") > col("s1")).count() == 0)
    // a rare term outranks a ubiquitous one: no rank-1 term has corpus-wide df
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(out.filter(col("rank") === 1 && col("df") === nDocs).count() == 0)
    out.unpersist()
  }

  test("q78: heavy hitters all clear the threshold and their mass is bounded") {
    import graft.queries.TrainingQueries.HeavyHitterDenom
    val out = SparkEntry.queries("q78_heavy_hitters")(spark, sf).cache()
    assert(out.count() > 0, "no heavy hitters found — threshold too high for the corpus")
    // at most Denom tokens can each carry >= 1/Denom of the mass
    assert(out.count() <= HeavyHitterDenom)
    val shareSum = out.agg(sum(col("share"))).head.getDouble(0)
    assert(shareSum <= 1.0 + 1e-6, s"hitter shares sum to $shareSum > 1")
    assert(out.filter(col("share") < 1.0 / HeavyHitterDenom - 1e-9).count() == 0)
    out.unpersist()
  }

  test("q84: splits partition every source, mix near 80/10/10, deterministic") {
    val out = SparkEntry.queries("q84_dataset_split")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(out.agg(sum(col("n_docs"))).head.getLong(0) == docs.count(), "splits must partition the corpus")
    // per-source fractions sum to 1 (4dp rounding slack)
    val fracSums = out.groupBy(col("source")).agg(sum(col("frac")).as("f"))
    assert(fracSums.filter(abs(col("f") - 1.0) > 0.001).count() == 0, "per-source fractions do not sum to 1")
    // corpus-wide train fraction lands near 0.8 (the corpus carries
    // exact-dup texts, so the content-keyed coin has fewer independent
    // draws than docs — bound loosely)
    val total = docs.count().toDouble
    val train = out.filter(col("split") === "train").agg(sum(col("n_docs"))).head.getLong(0)
    assert(train / total > 0.6 && train / total < 0.95, s"train fraction ${train / total} far from 0.8")
    // deterministic: a second evaluation reproduces the assignment
    val again = SparkEntry.queries("q84_dataset_split")(spark, sf)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    out.unpersist()
  }

  test("q67: OOV rate is consistent with its counts and bounded") {
    val out = SparkEntry.queries("q67_oov_rate")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_oov") > col("n_toks")).count() == 0)
    assert(out.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
    // the vocabulary covers the head: corpus-wide OOV mass stays minor
    val rate = out.agg(sum(col("n_oov")).cast("double") / sum(col("n_toks"))).head.getDouble(0)
    assert(rate < 0.5, s"corpus OOV rate $rate >= 0.5 — vocabulary not covering the head")
    out.unpersist()
  }

  test("q91: gated sample equals the naive whole-group window at two SFs, gate never underflows") {
    import graft.operators.Sampling
    import graft.queries.TrainingQueries.SampleK
    import org.apache.spark.sql.expressions.Window
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables.documents(spark, dir)
      // the completeness invariant the survivor gate rests on
      assert(
        Sampling.underflowGroups(docs, "source", "doc_id", "text", SampleK) == 0,
        s"sample gate underflow at $dir"
      )
      val got = SparkEntry.queries("q91_group_sample")(spark, dir)
      val naive = docs
        .select(col("source"), col("doc_id"), substring(md5(col("text")), 1, 8).as("h"))
        .withColumn(
          "rank",
          row_number().over(Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))).cast("long")
        )
        .filter(col("rank") <= SampleK)
      assert(
        got.except(naive).isEmpty && naive.except(got).isEmpty,
        s"gated sample diverges from the naive definition at $dir"
      )
    }
  }

  test("q92: collocations respect the count floor and PMI beats independence for repeated pairs") {
    val out = SparkEntry.queries("q92_pmi_collocations")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= graft.queries.TrainingQueries.PmiTopK)
    assert(out.forall(_.getLong(2) >= graft.queries.TrainingQueries.PmiMinCount), "count floor violated")
    // sorted by (pmi desc, w1, w2)
    val keys = out.map(r => (-r.getDouble(3), r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted, "top-k not in (pmi, w1, w2) order")
  }

  test("q93: LM scores are non-positive (MLE log-probs) and bigram counts match the token stream") {
    val out = SparkEntry.queries("q93_bigram_lm_score")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("lm_score") > 0.0).count() == 0, "a log2 probability exceeded 0")
    // sum of per-doc bigram events == corpus bigram total
    val totalFromDocs = out.agg(sum(col("n_bigrams"))).head.getLong(0)
    val expected = graft.sources.Tables
      .documents(spark, sf)
      .select(expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").as("n"))
      .filter(col("n") >= 2)
      .agg(sum(col("n") - 1))
      .head
      .getLong(0)
    assert(totalFromDocs == expected, s"bigram mass mismatch: $totalFromDocs vs $expected")
    out.unpersist()
  }

  test("q94: temperature weights sum to 1 and upweight small sources relative to their share") {
    val out = SparkEntry.queries("q94_temperature_mix")(spark, sf).cache()
    val wSum = out.agg(sum(col("weight"))).head.getDouble(0)
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    // alpha < 1 compresses: every source's weight must sit between its
    // raw share and the uniform share (inclusive up to rounding)
    val n = out.agg(sum(col("n_docs"))).head.getLong(0).toDouble
    val k = out.count().toDouble
    out.collect().foreach { r =>
      val share = r.getLong(1) / n
      val w = r.getDouble(2)
      val (lo, hi) = (math.min(share, 1.0 / k) - 1e-6, math.max(share, 1.0 / k) + 1e-6)
      assert(w >= lo && w <= hi, s"source ${r.getString(0)}: weight $w outside [$lo, $hi]")
    }
    out.unpersist()
  }

  test("q105: vocab growth is a partition of the corpus vocabulary with monotone saturation") {
    val out = SparkEntry.queries("q105_vocab_growth")(spark, sf).collect().sortBy(_.getLong(0))
    assert(out.length == graft.queries.TrainingQueries.VocabGrowthBuckets, "one row per bucket")
    // new_types partitions the vocabulary: the final cumulative count
    // is exactly the corpus-wide distinct token count
    val vocab = graft.sources.Tables
      .documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .distinct()
      .count()
    assert(out.last.getLong(3) == vocab, s"cum_types ${out.last.getLong(3)} != vocab $vocab")
    // cumulative counts are strictly the running sum and monotone;
    // occurrences cover the whole token stream
    var cum = 0L
    out.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) == cum, s"bucket ${r.getLong(0)}: cum_types not the running sum")
    }
    val totalToks = graft.sources.Tables
      .documents(spark, sf)
      .select(expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").as("n"))
      .agg(sum(col("n")))
      .head()
      .getLong(0)
    assert(out.map(_.getLong(1)).sum == totalToks, "bucket occurrences must cover the token stream")
    // Heaps saturation on a homogeneous synthetic corpus: the first
    // bucket discovers more types than the last
    assert(out.head.getLong(2) > out.last.getLong(2), "no saturation signal")
  }

  test("q93: a 49%-hot bigram survives the scoring join under AQE skew-split and matches the salted variant") {
    // the Zipf-skew assumption q93 rests on at corpus scale ("of the"
    // carries a double-digit share of all bigram occurrences), pinned
    // on a synthetic corpus where (of, the) is ~49% of events. The
    // model side is deliberately made non-broadcastable (threshold
    // -1, the 100 TB relative-size regime) and the skew thresholds
    // scaled down to the fixture so the detector faces the same
    // RELATIVE skew a cluster would.
    import graft.operators.SkewJoin
    import graft.queries.TrainingQueries
    import spark.implicits._
    // ONE hot key: "of of of ..." puts ~94% of events on (of, of) —
    // a second hot key (e.g. "of the" ⇒ hot (the, of) too) would land
    // in a different partition and inflate the detector's MEDIAN
    // partition size past the point where the hot one looks skewed at
    // the test's partition count (measured: that fixture does NOT
    // split)
    val docs = (1L to 400L)
      .map(i => (i, s"u$i v$i " + ("of " * 30).trim))
      .toDF("doc_id", "text")
      .localCheckpoint()
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // thresholds scale to the fixture's COMPRESSED shuffle sizes (a
    // partition of repeated "of of" pairs lz4-compresses to a few KB)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    try {
      val out = TrainingQueries.bigramLmScore(docs)
      val got = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.size == 400, "hot-bigram corpus did not complete")
      // fixture sanity: the hottest bigram really dominates
      val events = TrainingQueries.bigramEvents(docs)
      val counts = events.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab")).localCheckpoint()
      val hotShare = counts.agg(max(col("n_ab")).cast("double") / sum(col("n_ab"))).head.getDouble(0)
      assert(hotShare >= 0.5, s"fixture lost its skew: hottest bigram share $hotShare")
      // MEASURED (Spark 4.1, this config): with the model tables left
      // as in-plan aggregates AQE NEVER split — OptimizeSkewedJoin
      // only matches a join whose children are sorts directly over
      // shuffle stages, and forceOptimizeSkewedJoin made no
      // difference. bigramLmScore therefore checkpoints the model
      // (see its comment), after which the scoring SortMergeJoin is
      // marked skew=true without force. Asserted so a Spark upgrade
      // or a plan change that reintroduces the unsplittable shape
      // fails here — the signal to wire SkewJoin.saltedJoin in.
      val planStr = out.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"), s"AQE did not skew-split the scoring join:\n$planStr")
      // the salted fallback (SkewJoin on the packed (w1,w2) key,
      // doc-hash salt) produces the identical scores
      val pack = concat_ws("", col("w1"), col("w2"))
      val eventsK = TrainingQueries
        .bigramEvents(docs)
        .withColumn("__bk", pack)
        .select(col("doc_id"), col("__bk"))
      val prefix = counts.groupBy(col("w1")).agg(sum(col("n_ab")).as("n_a"))
      val dimK = counts.join(prefix, "w1").withColumn("__bk", pack).select(col("__bk"), col("n_ab"), col("n_a"))
      val salted = SkewJoin
        .saltedJoin(eventsK, dimK, "__bk", 8, Seq("doc_id"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_bigrams"),
          round(avg(log2(col("n_ab").cast("double") / col("n_a"))), 4).as("lm_score")
        )
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(salted == got, "salted variant diverged from the AQE-split plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q132: merge application equals a driver-side replay with q116's winning pair") {
    val pairs = SparkEntry.queries("q116_bpe_pair_counts")(spark, sf).collect()
    val top = pairs.head.getString(0) // q116 orders (n DESC, pair ASC)
    val (a, b) = (top.substring(0, 1), top.substring(1, 2))
    val out = SparkEntry.queries("q132_bpe_apply")(spark, sf).collect()
    assert(out.nonEmpty, "vocabulary must be non-empty")
    var merged = 0
    out.foreach { r =>
      val (tok, syms, n) = (r.getString(0), r.getString(2), r.getLong(3))
      val expected = tok.toCharArray.mkString(" ").replace(s"$a $b", top)
      assert(syms == expected, s"token '$tok': syms '$syms' != replay '$expected'")
      assert(n == syms.split(" ", -1).length.toLong, s"token '$tok': n_syms inconsistent")
      assert(syms.replace(" ", "") == tok, s"token '$tok': merge must preserve content")
      if (n < tok.length) merged += 1
    }
    assert(merged > 0, "the winning pair must actually merge somewhere in the vocabulary")
  }

  test("q131: gram accounting is exact and the importance signal separates the target language") {
    val out = SparkEntry
      .queries("q131_dsir_weights")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select(
        col("doc_id"),
        expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").as("n"),
        (col("lang") === "en").as("en")
      )
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), !r.isNullAt(2) && r.getBoolean(2)))
    // unigrams + bigrams: n + max(n-1, 0)
    docs.foreach { case (id, n, _) =>
      val expected = n + math.max(n - 1, 0)
      assert(out(id)._1 == expected.toLong, s"doc $id n_grams ${out(id)._1} != $expected")
      assert(out(id)._2.isDefined == (n > 0), s"doc $id li_ratio nullability wrong")
    }
    // the whole point of DSIR: target-language docs must score higher
    // under the target/raw ratio than the rest, on average
    val (enScores, otherScores) = docs
      .flatMap { case (id, _, en) => out(id)._2.map(en -> _) }
      .partition(_._1)
    assert(enScores.nonEmpty && otherScores.nonEmpty, "corpus must contain both classes")
    val enMean = enScores.map(_._2).sum / enScores.size
    val otherMean = otherScores.map(_._2).sum / otherScores.size
    assert(enMean > otherMean, s"importance signal inverted: en $enMean <= other $otherMean")
  }

  test("q127: learned weights equal a driver-side integer replay, and feed LinearModel.scoreBp") {
    import graft.operators.LogReg
    import graft.queries.TrainingQueries.{QualityTrainRounds, QualityWeightsBp}
    val xs = QualityWeightsBp.map(_._1)
    val feats = graft.queries.TrainingQueries
      .qualityModelScores(graft.sources.Tables.documents(spark, sf), Seq("lang"))
      .collect()
      .map { r =>
        val y = if (r.getAs[String]("lang") == "en") 1L else 0L
        (xs.map(c => r.getAs[Long](c)).toArray, y)
      }
    // the same hard-sigmoid gradient descent, replayed in plain Scala
    // longs — truncating integer division throughout, like `div`
    var b = 0L
    val w = Array.fill(xs.size)(0L)
    for (_ <- 1 to QualityTrainRounds) {
      var gB = 0L
      val g = Array.fill(xs.size)(0L)
      feats.foreach { case (x, y) =>
        val z = b + xs.indices.map(i => w(i) * x(i)).sum
        val p = math.max(0L, math.min(LogReg.ProbScale, LogReg.ProbScale / 2 + z / LogReg.ZDiv))
        val err = p - LogReg.ProbScale * y
        gB += err
        xs.indices.foreach(i => g(i) += err * x(i))
      }
      val n = feats.length
      b -= gB / n / LogReg.LrDiv
      xs.indices.foreach(i => w(i) -= g(i) / n / LogReg.LrDiv)
    }
    val learned = SparkEntry
      .queries("q127_quality_train")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(learned("bias") == b, s"bias mismatch: ${learned("bias")} vs $b")
    xs.zipWithIndex.foreach { case (c, i) =>
      assert(learned(c) == w(i), s"weight $c mismatch: ${learned(c)} vs ${w(i)}")
    }
    assert(learned.values.exists(_ != 0L), "training must move at least one weight off zero")
    // composability: the learned rows ARE a LinearModel — scoring with
    // them must reproduce the replay's final linear term per doc
    val scored = graft.queries.TrainingQueries
      .qualityModelScores(graft.sources.Tables.documents(spark, sf))
      .select(
        graft.etl.LinearModel
          .scoreBp(learned("bias"), xs.map(c => c -> learned(c)))
          .as("s")
      )
      .collect()
      .map(_.getLong(0))
    val expected = feats.map { case (x, _) => b + xs.indices.map(i => w(i) * x(i)).sum }
    assert(scored.sorted.toSeq == expected.sorted.toSeq, "LinearModel scoring with learned weights diverged")
  }
}
