package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.dotFold

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline: a tiny fixed probe set
  * broadcast against the corpus — one pass, no shuffle of the corpus.
  * The scale path is random-hyperplane LSH: corpus and probes map to
  * sign-pattern buckets (16 deterministic hyperplanes), the join is an
  * equi-join on bucket id, and ranking happens per bucket. At 100 TB
  * the bucketed corpus would be written bucketBy(bucket) so probe
  * lookups touch one bucket's files only.
  */
object Similarity {

  /** Exact top-k cosine neighbors of each probe (probe set must be
    * small — it is broadcast). Excludes self-matches.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus
      .select(col("vec_id"), col("v"))
      .withColumn("norm", sqrt(dotFold(col("v"), col("v"))))
    val p = probes
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .withColumn("pnorm", sqrt(dotFold(col("pv"), col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    c.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", dotFold(col("v"), col("pv")) / (col("norm") * col("pnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic hyperplane weights: LCG over (plane, dim) mapped to
    * [-1, 1]. Pure data, identical on every executor — shipped as a
    * literal array column (64 dims x numPlanes doubles, trivially
    * broadcastable).
    */
  def hyperplane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      val x = (1103515245L * (plane * dims + d) + 12345L) & 0x7fffffffL
      x.toDouble / 0x7fffffffL.toDouble * 2.0 - 1.0
    }

  /** Sign-pattern bucket id from `numPlanes` hyperplanes: bit p set iff
    * dot(v, plane_p) > 0. Pure Column fold, codegen'd.
    */
  def lshBucket(v: Column, numPlanes: Int, dims: Int): Column =
    (0 until numPlanes)
      .map { p =>
        val w = lit(hyperplane(p, dims).toArray)
        when(dotFold(v, w) > 0, shiftleft(lit(1), p)).otherwise(lit(0))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: probes only compare against corpus vectors in
    * the same bucket. Trades recall for a corpus-partitionable
    * equi-join; recall is measured in the spec against brute force.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, numPlanes: Int, dims: Int): DataFrame = {
    val c = corpus
      .select(col("vec_id"), col("v"))
      .withColumn("bucket", lshBucket(col("v"), numPlanes, dims))
      .withColumn("norm", sqrt(dotFold(col("v"), col("v"))))
    val p = probes
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .withColumn("bucket", lshBucket(col("pv"), numPlanes, dims))
      .withColumn("pnorm", sqrt(dotFold(col("pv"), col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    c.join(broadcast(p), "bucket")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", dotFold(col("v"), col("pv")) / (col("norm") * col("pnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }
}
