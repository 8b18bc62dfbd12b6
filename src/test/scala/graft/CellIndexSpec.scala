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

  test("ensure() builds once; probe-1 rows ARE the two-level assignment, probe-2 the verified runner-up cell") {
    spark.sql(s"DROP TABLE IF EXISTS $T")
    val full = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, T)
      .collect()
    val idx = full
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getSeq[Long](3).toArray.toSeq, r.getInt(4))))
      .toMap
    // reference: the in-memory two-level run over the same corpus —
    // the probe-1 rows must be BIT-IDENTICAL to the legacy single
    // assignment (every membership consumer depends on this)
    val q = KMeans.quantizeShifted(emb, "vec_id", "embedding").localCheckpoint()
    val k = math.max(KmeansK, (q.count() / SemClusterTarget).toInt)
    val st = KMeans.refineTwoLevelState(q, k, KmeansIters, Dims)
    val ref = st.assignment
      .join(q, Seq("vec_id"))
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](3).toArray.toSeq, r.getInt(4))))
      .toMap
    assert(idx.keySet == ref.keySet, "probe-1 row set differs from the in-memory assignment")
    idx.foreach { case (id, row) => assert(row == ref(id), s"vec $id differs: $row vs ${ref(id)}") }
    // probe-2 rows: at most one per vector, a DIFFERENT cluster, and
    // exactly the nearest foreign fine centroid among the union of the
    // two nearest coarse cells — derived here independently through
    // window ranking (the oracle's formulation) instead of the
    // operator's min-aggregates
    val p2 = full
      .filter(_.getInt(1) == 2)
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    p2.foreach { case (id, c2) => assert(c2 != idx(id)._1, s"vec $id: probe-2 equals the primary cluster") }
    import org.apache.spark.sql.expressions.Window
    val cd = q
      .crossJoin(broadcast(st.activeCoarse.select(col("cid").as("ccell"), col("ca").as("cca"))))
      .withColumn("cd2", KMeans.dist2(col("qa"), col("cca"), Dims))
      .withColumn("crank", row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("cd2").asc, col("ccell").asc)))
      .filter(col("crank") <= 2)
    val expect2 = cd
      .join(st.fine.select(col("cid"), col("cell").as("ccell"), col("ca").as("fca")), Seq("ccell"))
      .withColumn("d2", KMeans.dist2(col("qa"), col("fca"), Dims))
      .join(
        st.assignment.select(col("vec_id"), col("cluster").as("pcid")),
        Seq("vec_id")
      )
      .filter(col("cid") =!= col("pcid"))
      .withColumn("srn", row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("srn") === 1)
      .select(col("vec_id"), col("cid"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(p2 == expect2, "probe-2 rows differ from the window-ranked runner-up derivation")
    // second ensure() must be a pure read (memoized validation) and
    // see the identical content
    val again = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, T)
      .count()
    assert(again == full.length.toLong)
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
    // primary rows must equal the legacy frozen assignment; the full
    // probe-row set must equal the multi-probe frozen assignment
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
    val stored = after
      .filter(col("probe") === 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    expect.foreach { case (id, c) =>
      assert(stored.get(id).contains(c), s"appended vec $id: stored ${stored.get(id)}, frozen-assign $c")
    }
    val expectProbes = KMeans
      .assignMultiProbe(
        qBatch,
        cents.filter(col("level") === "fine").select(col("cid"), col("cell"), col("ca")),
        cents.filter(col("level") === "coarse").select(col("cid"), col("ca")),
        Dims
      )
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val storedBatch = after
      .join(batch.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(storedBatch == expectProbes, "appended probe rows differ from the frozen multi-probe assignment")
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
    // occupancy = MEMBERSHIP (probe-1 rows), the monitor's own metric
    def maxOcc: Long = spark
      .table(Ta)
      .filter(col("probe") === 1)
      .groupBy(col("cluster"))
      .count()
      .agg(max("count"))
      .head()
      .getLong(0)
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
    def snap(t: String): Map[(Long, Int), (Long, Seq[Long], Int)] =
      spark.table(t).collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getSeq[Long](3).toArray.toSeq, r.getInt(4)))).toMap
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

  private def geomOf(t: String): String = spark.sessionState.catalog
    .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
    .properties(CellIndex.GeomProp)

  private def propsOf(t: String): Map[String, String] = spark.sessionState.catalog
    .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
    .properties

  test("geometry hysteresis: appends crossing MANY k-steps validate without a rebuild; past the band ensure() retrains") {
    // the r12 verdict's one real defect: ensure() re-derived k from
    // the stamped count and demanded an exact GeomProp match, so any
    // append crossing a multiple of `target` rows forced a full
    // corpus re-train. This test lives in the regime every earlier
    // test avoided — target TINY (2) so n/target dominates kMin and
    // k steps on every other appended row.
    val Th = s"${T}_hyst"
    val kMin = 2; val target = 2
    spark.sql(s"DROP TABLE IF EXISTS $Th")
    // the corpus as a GROWING FILE SET (the production ingest shape):
    // bare-scan frames so the metadata-only tier is in play
    val dir = java.nio.file.Files.createTempDirectory("graft_cell_hyst").toString
    emb.filter(col("vec_id") < 128).write.mode("append").parquet(dir)
    CellIndex.ensure(
      spark.read.parquet(dir), "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Th)
    val g1 = geomOf(Th)
    assert(g1.startsWith("k=64,"), s"build geometry should be k=max(2,128/2)=64, got $g1")
    // append 100 rows -> crosses 50 k-steps (128/2=64 -> 228/2=114),
    // but mean occupancy 228/64 = 3.56 stays inside the 2x band (<= 4)
    CellIndex.append(
      emb.filter(col("vec_id") >= 128 && col("vec_id") < 228), "vec_id", "embedding", Some("label"), Th)
    emb.filter(col("vec_id") >= 128 && col("vec_id") < 228).write.mode("append").parquet(dir)
    CellIndex.invalidateMemo(Th)
    val scans0 = CellIndex.fingerprintScans.get()
    val served = CellIndex.ensure(
      spark.read.parquet(dir), "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Th)
    assert(served.filter(col("probe") === 1).count() == 228)
    assert(geomOf(Th) == g1, "an in-band k-step append must NOT re-train (geometry changed => rebuild ran)")
    assert(
      CellIndex.fingerprintScans.get() == scans0 + 1,
      "post-append ensure() pays exactly ONE content validation (the append cleared the source anchor)"
    )
    // ...and the successful validation re-anchored: the next fresh
    // session is METADATA-ONLY despite the crossed k-steps
    CellIndex.invalidateMemo(Th)
    CellIndex.ensure(
      spark.read.parquet(dir), "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Th)
    assert(
      CellIndex.fingerprintScans.get() == scans0 + 1,
      "in-band geometry must serve metadata-only in the steady state"
    )
    // grow past the band: n=500, mean occupancy 500/64 = 7.8 > 2x2 —
    // NOW a corpus pass is worth paying and ensure() must re-train
    CellIndex.append(emb.filter(col("vec_id") >= 228), "vec_id", "embedding", Some("label"), Th)
    emb.filter(col("vec_id") >= 228).write.mode("append").parquet(dir)
    CellIndex.invalidateMemo(Th)
    val rebuilt = CellIndex.ensure(
      spark.read.parquet(dir), "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Th)
    assert(rebuilt.filter(col("probe") === 1).count() == 500)
    assert(geomOf(Th).startsWith("k=250,"), s"past the band ensure() must re-train under the re-derived k, got ${geomOf(Th)}")
    spark.sql(s"DROP TABLE IF EXISTS $Th")
  }

  test("cross-JVM lost-update race: a stamp that lost an append's advance is rebuilt, never silently served") {
    // the class doc's concurrency claim, spec-pinned (r12 verdict #2):
    // two JVMs appending concurrently would interleave the stamp
    // read-modify-write and one batch's advance would be clobbered —
    // the table then holds MORE rows than the stamp describes.
    // Simulate the torn state directly: append, then ALTER the corpus
    // stamp back to its pre-append value (the lost update).
    val Tl = s"${T}_lost"
    spark.sql(s"DROP TABLE IF EXISTS $Tl")
    val base = emb.filter(col("vec_id") < 250)
    CellIndex.ensure(base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tl)
    val staleStamp = propsOf(Tl)(CellIndex.CorpusProp)
    CellIndex.append(emb.filter(col("vec_id") >= 250), "vec_id", "embedding", Some("label"), Tl)
    spark.sql(s"ALTER TABLE $Tl SET TBLPROPERTIES ('${CellIndex.CorpusProp}' = '$staleStamp')")
    CellIndex.invalidateMemo(Tl)
    val healed = CellIndex.ensure(
      emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tl)
    val expect = CellIndex.fingerprintOf(emb, "vec_id", "embedding").stamp
    assert(
      propsOf(Tl)(CellIndex.CorpusProp) == expect,
      "the torn stamp must be detected by content and the index rebuilt over the full corpus"
    )
    assert(healed.filter(col("probe") === 1).count() == emb.count(), "the healed index must cover every live row")
    spark.sql(s"DROP TABLE IF EXISTS $Tl")
  }

  test("a different (id, vector, label) column mapping never rides the memo or the metadata fast path") {
    // r12 advice (medium): the tier-1 fast path and the memo keyed on
    // (table, geometry, source) but not the column mapping — a
    // bare-scan ensure() with different columns was silently served
    // an index keyed on the wrong ones. The mapping is now stamped
    // (ColsProp) and in the memo key.
    val Tc = s"${T}_cols"
    spark.sql(s"DROP TABLE IF EXISTS $Tc")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tc)
    assert(spark.table(Tc).columns.contains("label"))
    // same session, same files, DIFFERENT mapping (no label): the
    // memo must not serve the labeled index
    CellIndex.ensure(emb, "vec_id", "embedding", None, KmeansK, SemClusterTarget, KmeansIters, Dims, Tc)
    assert(
      !spark.table(Tc).columns.contains("label"),
      "a label-mapping change was served the old index from the memo/stamp"
    )
    // fresh session, bare scan, mapping changed back: tier 1 must
    // refuse (ColsProp mismatch) and rebuild the labeled index
    CellIndex.invalidateMemo(Tc)
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tc)
    assert(spark.table(Tc).columns.contains("label"), "tier-1 served an index with the wrong column mapping")
    spark.sql(s"DROP TABLE IF EXISTS $Tc")
  }

  test("an opaque-frame validation preserves an existing source anchor (no steady-state degradation)") {
    // r12 advice (low): tier-2 success used to stampSource(None) for
    // opaque frames, UNSETTING a valid anchor and forcing every later
    // bare-scan session back onto a full corpus scan.
    val To = s"${T}_opaque"
    spark.sql(s"DROP TABLE IF EXISTS $To")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, To)
    assert(propsOf(To).contains(CellIndex.SourceProp), "bare-scan build must anchor the source")
    // an opaque consumer (filter node) over the same content: pays one
    // content validation, must NOT touch the anchor
    CellIndex.invalidateMemo(To)
    val scans0 = CellIndex.fingerprintScans.get()
    CellIndex.ensure(
      emb.filter(col("vec_id") >= 0), "vec_id", "embedding", Some("label"),
      KmeansK, SemClusterTarget, KmeansIters, Dims, To)
    assert(CellIndex.fingerprintScans.get() == scans0 + 1, "opaque frames validate by content")
    assert(
      propsOf(To).contains(CellIndex.SourceProp),
      "an opaque-frame validation unset the bare-scan sessions' source anchor"
    )
    // and the bare-scan steady state is still metadata-only
    CellIndex.invalidateMemo(To)
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, To)
    assert(CellIndex.fingerprintScans.get() == scans0 + 1, "anchor survived, so this session must not scan")
    spark.sql(s"DROP TABLE IF EXISTS $To")
  }

  test("appendAndMaintain is the cadence contract: frozen appends while healthy, monitor-triggered retrain when overgrown") {
    // r12 verdict #6: retrainIfOvergrown existed but nothing wired it
    // into the maintenance path. appendAndMaintain = append + monitor
    // in one entry point; same tiny-target regime as the hysteresis
    // test so the trigger arithmetic is deterministic.
    val Tm = s"${T}_maint"
    val kMin = 2; val target = 2
    spark.sql(s"DROP TABLE IF EXISTS $Tm")
    CellIndex.ensure(
      emb.filter(col("vec_id") < 128), "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Tm)
    val g1 = geomOf(Tm)
    // batch 1: monitor disarmed (overFactor huge) -> append only
    val retrained1 = CellIndex.appendAndMaintain(
      emb.filter(col("vec_id") >= 128 && col("vec_id") < 228),
      emb.filter(col("vec_id") < 228),
      "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Tm, overFactor = 1e9)
    assert(!retrained1, "a disarmed monitor must not retrain")
    assert(geomOf(Tm) == g1, "append-only maintenance must keep the frozen geometry")
    assert(CellIndex.readPrimary(spark, Tm).count() == 228)
    // batch 2: n=500 into k=64 -> max occupancy >= mean 7.8 > 2x2 at
    // the default overFactor, so the monitor MUST fire and the
    // retrained index must equal a from-scratch build
    val retrained2 = CellIndex.appendAndMaintain(
      emb.filter(col("vec_id") >= 228), emb,
      "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Tm)
    assert(retrained2, "an overgrown index must trigger the monitor's retrain")
    val Tf = s"${Tm}_fresh"
    spark.sql(s"DROP TABLE IF EXISTS $Tf")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, Tf)
    def snap(t: String): Map[(Long, Int), (Long, Seq[Long], Int)] =
      spark.table(t).collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getSeq[Long](3).toArray.toSeq, r.getInt(4)))).toMap
    val maintained = snap(Tm)
    val fresh = snap(Tf)
    assert(maintained.keySet == fresh.keySet)
    maintained.foreach { case (id, row) => assert(row == fresh(id), s"vec $id differs after monitor retrain") }
    spark.sql(s"DROP TABLE IF EXISTS $Tm"); spark.sql(s"DROP TABLE IF EXISTS $Tf")
  }

  test("compact() restores one file per bucket after append growth — answer- and stamp-invisible") {
    // each in-band append adds exactly one file per (non-empty)
    // bucket — the layout pin — so files grow linearly with batch
    // count and nothing inside the hysteresis band ever rewrote them
    // before compaction existed (r13 verdict #2)
    val Tc = s"${T}_cmp"
    def fileCount(t: String): Int = {
      val meta = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
      val loc = new org.apache.hadoop.fs.Path(meta.location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    }
    def stamps(t: String): Map[String, String] = {
      val p = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
        .properties
      Seq(CellIndex.VersionProp, CellIndex.GeomProp, CellIndex.ColsProp, CellIndex.CorpusProp)
        .flatMap(k => p.get(k).map(k -> _))
        .toMap
    }
    def snap(t: String): Map[(Long, Int), (Long, Seq[Long], Int)] =
      spark.table(t).collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getSeq[Long](3).toArray.toSeq, r.getInt(4)))).toMap
    spark.sql(s"DROP TABLE IF EXISTS $Tc")
    CellIndex.ensure(
      emb.filter(col("vec_id") < 200), "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tc)
    val base = fileCount(Tc)
    Seq((200, 300), (300, 400), (400, 500)).foreach { case (lo, hi) =>
      CellIndex.append(
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi), "vec_id", "embedding", Some("label"), Tc)
    }
    val grown = fileCount(Tc)
    assert(grown > base, s"three appends should have grown the file count ($base -> $grown)")
    val rowsBefore = snap(Tc)
    val stampsBefore = stamps(Tc)
    assert(CellIndex.compact(spark, Tc, maxFilesPerBucket = 1), "grown files must trigger the rewrite")
    assert(fileCount(Tc) <= CellIndex.Buckets, "compaction must restore at most one file per bucket")
    assert(fileCount(Tc) < grown)
    assert(snap(Tc) == rowsBefore, "compaction changed answers")
    assert(stamps(Tc) == stampsBefore, "compaction must preserve every graft stamp verbatim")
    // idempotent: a compact layout is left alone
    assert(!CellIndex.compact(spark, Tc, maxFilesPerBucket = 1))
    // freshness is about the corpus, not the file layout: a fresh
    // session's ensure() over the same corpus must validate (content
    // path — the appends cleared the source anchor), NOT rebuild
    CellIndex.invalidateMemo(Tc)
    val geomBefore = stampsBefore(CellIndex.GeomProp)
    val n = CellIndex
      .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tc)
      .count()
    assert(n == rowsBefore.size.toLong)
    assert(stamps(Tc)(CellIndex.GeomProp) == geomBefore, "post-compaction ensure() must not retrain")
    // the cadence entry point compacts when the monitor stays healthy
    spark.sql(s"DROP TABLE IF EXISTS $Tc")
    CellIndex.ensure(
      emb.filter(col("vec_id") < 300), "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, Tc)
    val retrained = CellIndex.appendAndMaintain(
      emb.filter(col("vec_id") >= 300), emb, "vec_id", "embedding", Some("label"),
      KmeansK, SemClusterTarget, KmeansIters, Dims, Tc, overFactor = 1e9, compactFilesPerBucket = 1)
    assert(!retrained)
    assert(fileCount(Tc) <= CellIndex.Buckets, "appendAndMaintain must compact past the threshold")
    spark.sql(s"DROP TABLE IF EXISTS $Tc")
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
    assert(again.filter(col("probe") === 1).count() == emb.count())
  }
}
