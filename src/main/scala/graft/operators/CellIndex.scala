package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Formats

/** The corpus-scaled k-means CELL PARTITION as a persisted ingest
  * artifact — the q87/q104/q107/q117 pay-one-shuffle-at-ingest story
  * applied to the engine's k-means family (q82 kNN join, q129
  * SemDeDup, q133 kNN classify, the q138 pipeline's semantic stage).
  * Round 10 left each of those consumers re-training the SAME
  * two-level Lloyd partition in-query — four duplicated clustering
  * runs per sweep, and the reason q82 regressed 1.3→7.9 s at sf0.1.
  *
  * Layout:
  *   - `<table>`: (vec_id, cluster, qa[, label]) bucketed by
  *     `cluster` — the within-cluster self-joins every consumer runs
  *     (pair pruning, kNN candidates) read both sides from the stored
  *     bucketing with ZERO exchange (PlanSpec-asserted, the q87
  *     pattern); `label` rides along so q82's (cluster × label)
  *     blocks need no vec_id-keyed side join that would destroy the
  *     bucketed partitioning.
  *   - `<table>_cents`: the trained geometry — fine (cid, cell, ca)
  *     centroids and active coarse (cid, ca) centroids — what the
  *     APPEND path assigns new vectors against under frozen geometry
  *     ([[KMeans.assignFrozen]]), plus a 1-row scale entry freezing
  *     the quantization scale (appends must quantize new vectors
  *     exactly as the build did; the scale travels as raw
  *     doubleToLongBits so no decimal round-trip can perturb it).
  *
  * Version/geometry/corpus stamps are TABLE PROPERTIES (metadata-only
  * checks, the Dedup.writeSignatureIndex convention): a format bump,
  * a geometry change (k/target/iters/dims), or a corpus change
  * (count + content fingerprint) is detected at read time and
  * triggers a rebuild in [[ensure]] instead of silently serving a
  * stale partition. The fingerprint is an ORDER-FREE sum of per-row
  * hashes, so it is append-additive: appending a batch advances the
  * stored stamp by the batch's own fingerprint and [[ensure]] over
  * the grown corpus still validates.
  *
  * At 100 TB this table is written once per corpus snapshot by the
  * ingest job and every similarity/dedup consumer joins it by
  * `cluster` for free; [[ensure]]'s build-if-absent is the test-scale
  * stand-in for that ingest job (first consumer in a session pays the
  * training, everyone else — and every later session over the same
  * corpus — reads).
  */
object CellIndex {

  /** Bump on any change to the assignment/quantization arithmetic. */
  val FormatVersion = 1
  val VersionProp = "graft.cell_format_version"
  val GeomProp = "graft.cell_geometry"
  val CorpusProp = "graft.cell_corpus"
  val Buckets = 16

  private def geomString(k: Int, target: Int, iters: Int, dims: Int): String =
    s"k=$k,target=$target,iters=$iters,dims=$dims"

  /** Order-free corpus identity: (row count, sum of per-row murmur3
    * over id + vector). One cheap columnar scan; additive under
    * union, so appends can advance it without re-scanning.
    */
  def fingerprintOf(emb: DataFrame, idCol: String, vecCol: String): (Long, Long) = {
    val r = emb
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(hash(col(idCol), col(vecCol)).cast("long")), lit(0L)).as("fp")
      )
      .head()
    (r.getLong(0), r.getLong(1))
  }

  // tables fingerprint-validated (or freshly built) in this JVM — the
  // per-session memo that lets the 2nd..nth consumer skip the
  // validation scan; content cannot change under a fixed dir mid-run
  private val validated = scala.collection.mutable.Set[String]()

  /** Test hook: forget a table's in-JVM validation so the next
    * [[ensure]] re-walks the stamp path (simulates a fresh session).
    */
  private[graft] def invalidateMemo(table: String): Unit = synchronized { validated -= table }

  /** Read-or-build: validate the stored stamps against the corpus and
    * requested geometry; rebuild on any mismatch. Returns the
    * assignment frame (vec_id, cluster, qa[, label]) read from the
    * bucketed table.
    */
  def ensure(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: Option[String],
      kMin: Int,
      target: Int,
      iters: Int,
      dims: Int,
      table: String
  ): DataFrame = synchronized {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark) // graft_dist2i in the assignment path
    if (!validated.contains(table)) {
      val (n, fp) = fingerprintOf(emb, idCol, vecCol)
      val k = math.max(kMin, (n / target).toInt)
      val geom = geomString(k, target, iters, dims)
      val corpus = s"n=$n,fp=$fp"
      val fresh = tableExists(spark, table) && {
        val props = tableProps(spark, table)
        props.get(VersionProp).contains(FormatVersion.toString) &&
        props.get(GeomProp).contains(geom) &&
        props.get(CorpusProp).contains(corpus)
      }
      if (!fresh) build(emb, idCol, vecCol, labelCol, k, target, iters, dims, n, fp, table)
      validated += table
    }
    read(spark, table)
  }

  /** Train the two-level partition and persist assignment + geometry.
    * Exposed for tests; production callers go through [[ensure]].
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: Option[String],
      k: Int,
      target: Int,
      iters: Int,
      dims: Int,
      n: Long,
      fp: Long,
      table: String
  ): Unit = {
    val spark = emb.sparkSession
    val q = KMeans.quantizeShifted(emb, idCol, vecCol).localCheckpoint()
    val st = KMeans.refineTwoLevelState(q, k, iters, dims)
    val withQa = st.assignment.select(col("vec_id"), col("cluster")).join(q, Seq("vec_id"))
    val asg = labelCol match {
      case Some(l) =>
        withQa.join(emb.select(col(idCol).as("vec_id"), col(l).as("label")), Seq("vec_id"))
      case None => withQa
    }
    dropTable(spark, table)
    Formats.writeBucketed(asg, table, "cluster", Buckets)
    // frozen quantization scale for the append path, exact to the bit
    val scale = emb
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0 && !exists(col("v"), x => x.isNull))
      .agg(max(array_max(transform(col("v"), x => abs(x)))))
      .head()
      .getDouble(0)
    val cents = st.fine
      .select(lit("fine").as("level"), col("cid"), col("cell"), col("ca"))
      .unionByName(
        st.activeCoarse.select(lit("coarse").as("level"), col("cid"), lit(null).cast("long").as("cell"), col("ca"))
      )
      .unionByName(
        spark
          .range(1)
          .select(
            lit("scale").as("level"),
            lit(java.lang.Double.doubleToLongBits(scale)).as("cid"),
            lit(null).cast("long").as("cell"),
            lit(null).cast("array<bigint>").as("ca")
          )
      )
    dropTable(spark, s"${table}_cents")
    cents.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(s"${table}_cents")
    spark.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES (" +
        s"'$VersionProp' = '$FormatVersion', " +
        s"'$GeomProp' = '${geomString(k, target, iters, dims)}', " +
        s"'$CorpusProp' = 'n=$n,fp=$fp')"
    )
  }

  /** Open the persisted assignment, refusing a format-version
    * mismatch (metadata-only check — no data read).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = tableProps(spark, table).get(VersionProp)
    require(
      v.contains(FormatVersion.toString),
      s"cell index '$table' has format version ${v.getOrElse("<unstamped>")}, " +
        s"current is $FormatVersion — rebuild the index"
    )
    // appends may land from ANOTHER session (a streaming micro-batch
    // clone's foreachBatch): this session's relation cache would keep
    // serving the pre-append file list. Refresh costs one directory
    // re-listing — correctness over a cached listing.
    spark.catalog.refreshTable(table)
    spark.table(table)
  }

  /** Append a batch of new vectors ASSIGNED UNDER THE FROZEN GEOMETRY
    * (stored centroids + stored quantization scale — no Lloyd update,
    * no one else's cluster moves), preserving the bucket layout and
    * advancing the additive corpus stamp. The maintenance path
    * between geometry re-trains; a corpus grown past its geometry's
    * occupancy target is re-trained by the next [[ensure]] (the
    * stored k no longer matches the recomputed one).
    */
  def append(newEmb: DataFrame, idCol: String, vecCol: String, labelCol: Option[String], table: String): Unit = {
    val spark = newEmb.sparkSession
    read(spark, table) // loud version gate
    val props = tableProps(spark, table)
    val geom = props(GeomProp)
    val dims = geom.split(",").map(_.split("=")).map(a => a(0) -> a(1)).toMap.apply("dims").toInt
    val cents = spark.table(s"${table}_cents").localCheckpoint()
    val scaleBits = cents.filter(col("level") === "scale").select(col("cid")).head().getLong(0)
    val scale = java.lang.Double.longBitsToDouble(scaleBits)
    val v = newEmb
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0 && !exists(col("v"), x => x.isNull))
    val q = v.select(
      col("vec_id"),
      (if (scale == 0) array_repeat(lit(KMeans.Shift.toLong), size(col("v")))
       else expr(s"transform(v, x -> CAST(round(127 * x / ${java.lang.Double.toString(scale)}, 0) AS BIGINT) + ${KMeans.Shift})")).as("qa")
    )
    val asg = KMeans.assignFrozen(
      q,
      cents.filter(col("level") === "fine").select(col("cid"), col("cell"), col("ca")),
      cents.filter(col("level") === "coarse").select(col("cid"), col("ca")),
      dims
    )
    val rows = labelCol match {
      case Some(l) =>
        asg.join(newEmb.select(col(idCol).as("vec_id"), col(l).as("label")), Seq("vec_id"))
      case None => asg
    }
    val (bn, bfp) = fingerprintOf(newEmb, idCol, vecCol)
    val old = props(CorpusProp).split(",").map(_.split("=")).map(a => a(0) -> a(1).toLong).toMap
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    val numBuckets = meta.bucketSpec
      .map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(s"cell index '$table' is not bucketed"))
    rows.write
      .mode(SaveMode.Append)
      .format("parquet")
      .bucketBy(numBuckets, "cluster")
      .sortBy("cluster")
      .saveAsTable(table)
    spark.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES " +
        s"('$CorpusProp' = 'n=${old("n") + bn},fp=${old("fp") + bfp}')"
    )
  }

  private def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  private def tableProps(spark: SparkSession, table: String): Map[String, String] =
    spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties

  private def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
