package graft
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.read(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // full pipeline, staged
    for (i <- 1 to 4) {
      time(s"minhashLsh iter $i") {
        operators.Dedup.minhashLsh(docs, "text", "doc_id").write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache(); System.gc()
    }
    spark.stop()
  }
}
