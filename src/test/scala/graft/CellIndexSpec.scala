package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CellIndex, KMeans}
import graft.queries.DedupSimQueries.{Dims, KmeansIters, KmeansK, SemClusterTarget}
import graft.sources.Tables

/** The persisted cell-partition artifact (operators/CellIndex): the
  * q87/q107 pay-once-at-ingest contract applied to the k-means family
  * — build-if-absent freshness, frozen-geometry appends, bucket-layout
  * survival, loud version gates.
  */
class CellIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val T = "graft_cell_spec_idx"

  private def emb = Tables.embeddings(spark, sf)

  test("ensure() builds once and returns exactly the two-level assignment + quantized vectors") {
    spark.sql(s"DROP TABLE IF EXISTS $T")
    val idx = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, T)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toArray.toSeq, r.getInt(3))))
      .toMap
    // reference: the in-memory two-level run over the same corpus
    val q = KMeans.quantizeShifted(emb, "vec_id", "embedding").localCheckpoint()
    val k = math.max(KmeansK, (q.count() / SemClusterTarget).toInt)
    val ref = KMeans
      .refineTwoLevel(q, k, KmeansIters, Dims)
      .join(q, Seq("vec_id"))
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](3).toArray.toSeq, r.getInt(4))))
      .toMap
    assert(idx.keySet == ref.keySet, "index row set differs from the in-memory assignment")
    idx.foreach { case (id, row) => assert(row == ref(id), s"vec $id differs: $row vs ${ref(id)}") }
    // second ensure() must be a pure read (memoized validation) and
    // see the identical content
    val again = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, T)
      .count()
    assert(again == idx.size.toLong)
  }

  test("append assigns the batch under FROZEN geometry, preserves the bucket layout, and advances the additive stamp") {
    // id-RANGE split: seeds are the first-k ids, so the base corpus
    // must stay dense from 0 (the declared dense-seed contract)
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    spark.sql(s"DROP TABLE IF EXISTS ${T}_app")
    CellIndex.ensure(
      base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, s"${T}_app")
    val beforeMeta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(s"${T}_app"))
    CellIndex.append(batch, "vec_id", "embedding", Some("label"), s"${T}_app")
    val after = CellIndex.read(spark, s"${T}_app")
    // 1) layout: still bucketed by cluster with the same bucket count
    val afterMeta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(s"${T}_app"))
    assert(afterMeta.bucketSpec == beforeMeta.bucketSpec, "append changed the bucket layout")
    // 2) the appended rows carry the frozen-geometry assignment: the
    //    batch quantized under the STORED scale, coarse+fine assigned
    //    against the STORED centroids
    val cents = spark.table(s"${T}_app_cents")
    val scale = java.lang.Double.longBitsToDouble(
      cents.filter(col("level") === "scale").select(col("cid")).head().getLong(0)
    )
    val qBatch = batch
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(
        col("vec_id"),
        expr(s"transform(v, x -> CAST(round(127 * x / ${java.lang.Double.toString(scale)}, 0) AS BIGINT) + ${KMeans.Shift})")
          .as("qa")
      )
    val expect = KMeans
      .assignFrozen(
        qBatch,
        cents.filter(col("level") === "fine").select(col("cid"), col("cell"), col("ca")),
        cents.filter(col("level") === "coarse").select(col("cid"), col("ca")),
        Dims
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val stored = after.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    expect.foreach { case (id, c) =>
      assert(stored.get(id).contains(c), s"appended vec $id: stored ${stored.get(id)}, frozen-assign $c")
    }
    // 3) the corpus stamp advanced additively: a FRESH session's
    //    ensure() over the full corpus must validate the appended
    //    stamps without a rebuild. Geometry note: ensure recomputes
    //    k from the full count — on this corpus k is floor-stable
    //    across the 20% append (same N/target bucket), so only the
    //    corpus stamp is at stake.
    val nAfter = after.count()
    CellIndex.invalidateMemo(s"${T}_app")
    val kBase = math.max(KmeansK, (base.count() / SemClusterTarget).toInt)
    val kFull = math.max(KmeansK, (emb.count() / SemClusterTarget).toInt)
    if (kBase == kFull) {
      val revalidated = CellIndex.ensure(
        emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, s"${T}_app")
      assert(revalidated.count() == nAfter, "post-append ensure() should validate, not rebuild")
    }
  }

  test("a format-version mismatch is refused loudly; a changed corpus triggers a rebuild") {
    spark.sql(s"DROP TABLE IF EXISTS ${T}_gate")
    CellIndex.ensure(
      emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, s"${T}_gate")
    spark.sql(s"ALTER TABLE ${T}_gate SET TBLPROPERTIES ('${CellIndex.VersionProp}' = '0')")
    val e = intercept[IllegalArgumentException](CellIndex.read(spark, s"${T}_gate"))
    assert(e.getMessage.contains("format version"), e.getMessage)
    // a different corpus under the same table name must rebuild (the
    // fingerprint, not the name, is the identity); the memo is
    // per-JVM so use a fresh table to exercise the stamp path
    spark.sql(s"DROP TABLE IF EXISTS ${T}_fp")
    val half = emb.filter(col("vec_id") < 250)
    CellIndex.ensure(
      half, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, s"${T}_fp")
    val nHalf = spark.table(s"${T}_fp").count()
    // simulate a new session seeing a regenerated corpus at the same path
    CellIndex.invalidateMemo(s"${T}_fp")
    val rebuilt = CellIndex.ensure(
      emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, s"${T}_fp")
    assert(rebuilt.count() > nHalf, "changed corpus must trigger a rebuild")
  }

  test("steady-state validation is METADATA-ONLY: a fresh session's ensure() never scans the corpus") {
    // the round-12 contract (VERDICT r11 #1): with a valid index and a
    // bare-file-scan corpus frame, a fresh session serves the index
    // after a driver-side file-listing + catalog-props check — zero
    // content-fingerprint scans, zero Spark jobs over the embeddings.
    val Tm = s"${T}_meta"
    spark.sql(s"DROP TABLE IF EXISTS $Tm")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tm)
    val n = spark.table(Tm).count()
    // fresh session over the SAME corpus files: fast path, no scan
    CellIndex.invalidateMemo(Tm)
    val scans0 = CellIndex.fingerprintScans.get()
    val served = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tm)
    assert(CellIndex.fingerprintScans.get() == scans0, "steady-state ensure() ran a content fingerprint scan")
    assert(served.count() == n)
    // and the served plan touches only the index table, not the corpus
    val scanned = served.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.tableIdentifier.map(_.table).getOrElse("<path>")
    }
    assert(scanned.nonEmpty && scanned.forall(_ == Tm), s"consumer plan reads beyond the index table: $scanned")
    // a lost source anchor falls back to ONE content validation (no
    // rebuild) and re-anchors, so the session after that is fast again
    spark.sql(s"ALTER TABLE $Tm UNSET TBLPROPERTIES IF EXISTS ('${CellIndex.SourceProp}')")
    CellIndex.invalidateMemo(Tm)
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tm)
    assert(CellIndex.fingerprintScans.get() == scans0 + 1, "missing source stamp must revalidate by content, once")
    CellIndex.invalidateMemo(Tm)
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tm)
    assert(CellIndex.fingerprintScans.get() == scans0 + 1, "content validation must re-anchor the source stamp")
  }

  test("a same-session geometry change is never served from the memo") {
    // r11 advice: the table-keyed memo let ensure() with different
    // kMin/target/iters/dims ride an earlier validation. The memo now
    // keys on the geometry params too: a target change re-derives k
    // and rebuilds under the new geometry.
    val Tg = s"${T}_geom"
    spark.sql(s"DROP TABLE IF EXISTS $Tg")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tg)
    def geomOf: String = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(Tg))
      .properties(CellIndex.GeomProp)
    val g1 = geomOf
    // NO invalidateMemo: the stale-memo hazard is exactly same-session
    val target2 = SemClusterTarget / 2
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, target2, KmeansIters, Dims, Tg)
    val g2 = geomOf
    assert(g2 != g1, "geometry change was served from the old-geometry memo")
    assert(g2.contains(s"target=$target2"), s"stored geometry $g2 does not reflect the new target")
  }

  test("the q142 monitor's ACT path: overgrown appends trigger an in-place retrain equal to a from-scratch build") {
    // close the build → consume → monitor → ACT loop: frozen-geometry
    // appends can only grow clusters (no Lloyd update moves anyone),
    // so occupancy drifts up until the q142 flag raises; the act path
    // (retrainIfOvergrown = drop + ensure under the recomputed k) must
    // restore exactly the partition a from-scratch ingest would build.
    val Ta = s"${T}_act"
    spark.sql(s"DROP TABLE IF EXISTS $Ta")
    val base = emb.filter(col("vec_id") < 250)
    val batch = emb.filter(col("vec_id") >= 250)
    CellIndex.ensure(base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Ta)
    // healthy index: the monitor is a no-op (and touches no corpus)
    assert(
      !CellIndex.retrainIfOvergrown(
        base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Ta, 1e9),
      "a healthy index must not retrain"
    )
    CellIndex.append(batch, "vec_id", "embedding", Some("label"), Ta)
    def maxOcc: Long = spark.table(Ta).groupBy(col("cluster")).count().agg(max("count")).head().getLong(0)
    val occBefore = maxOcc
    // an overFactor the doubled corpus is guaranteed to flag
    val f = (occBefore - 1).toDouble / SemClusterTarget
    assert(
      CellIndex.retrainIfOvergrown(
        emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Ta, f),
      "an overgrown index must retrain"
    )
    // the retrained partition IS the from-scratch build (deterministic
    // seeding — consumers' answers are unchanged vs a fresh ingest)
    val Tf = s"${T}_act_fresh"
    spark.sql(s"DROP TABLE IF EXISTS $Tf")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tf)
    def snap(t: String): Map[Long, (Long, Seq[Long], Int)] =
      spark.table(t).collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toArray.toSeq, r.getInt(3)))).toMap
    val retrained = snap(Ta)
    val fresh = snap(Tf)
    assert(retrained.keySet == fresh.keySet, "retrained row set differs from the from-scratch build")
    retrained.foreach { case (id, row) => assert(row == fresh(id), s"vec $id differs after retrain") }
    // Lloyd rebalanced what frozen appends skewed (or is already under
    // the monitor's own 2x-target bar — k-means gives no hard cap)
    assert(
      maxOcc <= occBefore || maxOcc <= 2L * SemClusterTarget,
      s"retrain improved nothing: max occupancy $occBefore -> $maxOcc (target $SemClusterTarget)"
    )
    // and the retrained index serves the steady-state fast path
    CellIndex.invalidateMemo(Ta)
    val scans0 = CellIndex.fingerprintScans.get()
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Ta)
    assert(CellIndex.fingerprintScans.get() == scans0, "retrained index must validate metadata-only")
  }

  test("revalidate() audits the stamp by content and detects drift") {
    val Tr = s"${T}_reval"
    spark.sql(s"DROP TABLE IF EXISTS $Tr")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tr)
    assert(CellIndex.revalidate(emb, "vec_id", "embedding", Tr), "intact corpus must revalidate true")
    // simulate stamp/corpus divergence (a lost concurrent append)
    spark.sql(s"ALTER TABLE $Tr SET TBLPROPERTIES ('${CellIndex.CorpusProp}' = 'n=1,fp=2,fp2=3')")
    assert(!CellIndex.revalidate(emb, "vec_id", "embedding", Tr), "drifted stamp must revalidate false")
    // drop + ensure is the recovery surface
    CellIndex.drop(spark, Tr)
    assert(!spark.catalog.tableExists(Tr))
    val again = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tr)
    assert(CellIndex.revalidate(emb, "vec_id", "embedding", Tr))
    assert(again.count() == emb.count())
  }
}
