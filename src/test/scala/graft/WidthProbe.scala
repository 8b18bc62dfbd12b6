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
    spark.stop()
  }
}
