package graft

/** Throwaway diagnostic: print clusterWidth decisions + estimates for
  * the real keyClustered inputs at a given dir.
  * `sbt "Test/runMain graft.WidthProbe /root/testdata/sf0.1"`
  */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, dir)
    val sh = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3)
    def show(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      println(f"[width] $label%-28s est=${est.toDouble / 1048576}%10.2f MB width=${graft.dedup.Dedup.clusterWidth(df)}")
    }
    show("shingle projection", sh.select("shingle"))
    show("shingles full", sh)
    val capped = graft.dedup.Dedup.dfCapped(sh, 50)
    show("dfCapped", capped)
    val ckpt = graft.dedup.Dedup.checkpointHeavy(capped)
    show("checkpointed shingles3", ckpt)
    // the q138 stage-1 checkpoint input (md5-dedup join output) at the
    // wide text divisor — the frame DedupPipeline width-clusters
    import org.apache.spark.sql.functions.{md5, min}
    val withMd5 = docs.select(col("doc_id"), col("text")).withColumn("text_md5", md5(col("text")))
    val keep = withMd5.groupBy(col("text_md5")).agg(min(col("doc_id")).as("keep_id"))
    val st1in = withMd5
      .join(keep, Seq("text_md5"))
      .select(col("doc_id"), col("text"), (col("doc_id") =!= col("keep_id")).as("exact_dup"))
    val est1 = st1in.queryExecution.optimizedPlan.stats.sizeInBytes
    for (kb <- Seq(512L, 1024L, 2048L))
      println(f"[width] st1 (div ${kb}KB)            est=${est1.toDouble / 1048576}%10.2f MB width=${graft.dedup.Dedup.clusterWidth(st1in, kb)}")
    spark.stop()
  }
}
