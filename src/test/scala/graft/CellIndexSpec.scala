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
}
