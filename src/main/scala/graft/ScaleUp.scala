package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger benchmark dataset from an existing SF directory by
  * key-shifted replication — the 100× scaling point the sf0.01→sf0.1
  * table cannot provide (strongly sub-linear there = mostly fixed
  * overhead; the data terms only start to bite another decade up).
  *
  * Replication is FAIR to the operators being stressed, not a
  * degenerate copy: a plain 10× duplication of documents would make
  * every near-dup family quadratic in the replica count (10 identical
  * copies of each doc = 100× the pairs of a real 10× corpus), which
  * benchmarks a pathology, not scale. Instead each replica is mapped
  * into its own disjoint key/content space:
  *  - fact/dim keys shift by replica · KeyStride (joins stay
  *    consistent; the part graph becomes `replicas` disconnected
  *    copies — PageRank over 10× nodes and edges);
  *  - document TEXT suffixes every token with a replica tag, so
  *    within-replica duplicate structure is preserved exactly while
  *    cross-replica shingles never collide (vocabulary grows ~10×,
  *    which is what a 10× crawl does);
  *  - embeddings rotate their dimensions by the replica index —
  *    norms preserved, cross-replica cosines decorrelated.
  * nation/region stay fixed (dims don't grow with fact scale).
  *
  * Output is a bench artifact under target/ — correctness always runs
  * against the driver's own testdata, never this.
  *
  * Usage: sbt "runMain graft.ScaleUp [srcDir] [outDir]"
  *   SPARK_GRAFT_SCALE_REPLICAS=10 (default)
  */
object ScaleUp {

  val KeyStride = 1000000000L

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** The per-epoch ±1 diagonal of the embedding transform (epoch 0 =
    * identity; epoch ≥1 = a splitmix bit per dimension, forced
    * non-identity). Exposed for the spec that pins epochs pairwise
    * distinct — a repeated mask would recreate the exact-duplicate
    * pathology the rotation cap used to guard against.
    */
  private[graft] def signMask(s: Int, dims: Int): Array[Float] = {
    val m = Array.tabulate(dims)(d => if (s == 0 || (splitmix(s.toLong * 7919L + d) & 1L) == 0L) 1f else -1f)
    if (s > 0 && !m.contains(-1f)) m((s - 1) % dims) = -1f // never the identity off epoch 0
    m
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/target/sf1-derived"
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICAS", "10").toInt
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shifted(df: DataFrame, keyCols: Seq[String], i: Int): DataFrame =
      keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(KeyStride * i)))

    def requireKeysFit(df: DataFrame, name: String, keyCols: Seq[String]): Unit =
      keyCols.foreach { c =>
        // cast + null check: Int-typed keys and empty tables get a
        // clear diagnostic instead of a ClassCastException/NPE
        val row = df.agg(max(col(c)).cast("long")).head
        require(!row.isNullAt(0), s"$name is empty (or $name.$c all NULL) — nothing to scale")
        val mx = row.getLong(0)
        require(
          mx < KeyStride,
          s"$name.$c max $mx >= KeyStride $KeyStride — replicas would cross-link " +
            "(e.g. scaling an already-scaled output); raise KeyStride"
        )
      }

    def replicate(
        name: String,
        keyCols: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d
    ): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      requireKeysFit(base, name, keyCols)
      val full = (0 until replicas)
        .map(i => perReplica(shifted(base, keyCols, i), i))
        .reduce(_ union _)
      full.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$replicas -> $out/$name.parquet")
    }

    // dims stay fixed
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate(
      "documents",
      Seq("doc_id"),
      (d, i) =>
        if (i == 0) d
        else
          d.withColumn(
            "text",
            // tag WITHOUT a separator char: the engine's word regex is
            // '[a-z0-9]+', so 'alphar3' stays ONE (new) token while
            // 'alpha_r3' would split back into the ORIGINAL token plus
            // a tag — silently collapsing the vocabulary growth this
            // transform exists to produce for regex-tokenized
            // operators (q48/q76/q92/q93/q98/q100/q105)
            array_join(transform(split(col("text"), "\\s+"), w => concat(w, lit(s"zq$i"))), " ")
          )
          // the tag lengthens the text; n_chars must keep describing it
          // (length gates and sampling weights read n_chars)
          .withColumn("n_chars", length(col("text")).cast("long"))
    )
    // Per-replica orthogonal transform Q_i = D_s ∘ R_r with rotation
    // r = i mod dims and a SIGN-FLIP EPOCH s = i div dims: rotation
    // alone repeats at i = dims (replica `dims` would carry
    // bit-identical vectors to replica 0 — cross-replica cosine 1.0,
    // the exact pathology the transform exists to prevent), which
    // capped the scaling probe at 64× (round 11). Each epoch s ≥ 1
    // composes the rotation with a deterministic ±1 diagonal (splitmix
    // bit per (s, dim), guaranteed non-identity), so replicas stay
    // pairwise-distinct orthogonal images for replicas ≤ dims·2^dims:
    // norms, within-replica cosine structure and per-vector max-abs
    // (the quantization scale) are preserved EXACTLY, cross-replica
    // cosines decorrelate. Epoch 0 is the identity mask — replicas
    // 0..dims-1 are bit-identical to what earlier rounds measured.
    val dims = spark.read.parquet(s"$src/embeddings.parquet").select(size(col("embedding"))).head.getInt(0)
    replicate(
      "embeddings",
      Seq("vec_id"),
      (d, i) => {
        val rot = i % dims
        val epoch = i / dims
        val rotated =
          if (rot == 0) d
          else {
            val n = size(col("embedding"))
            val k = lit(rot) % n
            d.withColumn(
              "embedding",
              concat(slice(col("embedding"), k + 1, n - k), slice(col("embedding"), lit(1), k))
            )
          }
        if (epoch == 0) rotated
        else {
          val mask = array(signMask(epoch, dims).map(v => lit(v)): _*)
          rotated.withColumn("embedding", zip_with(col("embedding"), mask, (x, m) => x * m))
        }
      }
    )
    spark.stop()
  }
}
