package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway r18 probe: star-round count + edge stats for clusterLabels. */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    println("docs=" + docs.count())
    val edges = graft.operators.DedupOps.bandStarEdges(
      graft.operators.DedupOps.r1Bands(docs, "doc_id", "text"))
    println("edges=" + edges.count())
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    val lab = graft.operators.DedupOps.clusterLabels(docs)
    lab.write.format("noop").mode("overwrite").save()
    println(f"clusterLabels ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"rounds=${graft.functions.Dedup.lastCcRounds}")
    spark.stop()
  }
}
