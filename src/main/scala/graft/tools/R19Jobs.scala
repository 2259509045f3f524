package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 job-structure probe: run ONE query under a
  * [[graft.metrics.StageMetricsListener]] and print every job with its
  * stage names and wall span, so per-phase job costs (banding, CC
  * rounds, convergence collects, final materialization) are visible.
  *
  *   sbt 'runMain graft.tools.R19Jobs <query> [sfDir]'
  */
object R19Jobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dd27_incremental_labels")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.tools.LogHygiene.suppressTinyFrameWindowWarnings()
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    val q = graft.SparkEntry.all.find(_.name == name).getOrElse(
      sys.error(s"unknown query $name"))
    // warmup
    q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    val l = new graft.metrics.StageMetricsListener
    val t0 = System.nanoTime()
    l.collect(spark) {
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sharedState.cacheManager.clearCache()
    val byJob = l.spans.groupBy(_.jobId).toSeq.sortBy(_._1)
    var prevEnd = 0L
    byJob.foreach { case (jid, spans) =>
      val s0 = spans.map(_.startMs).min
      val e0 = spans.map(_.endMs).max
      val gap = if (prevEnd == 0) 0L else s0 - prevEnd
      prevEnd = math.max(prevEnd, e0)
      val names = spans.map(_.name).distinct.mkString(" | ")
      println(f"job $jid%4d  ${e0 - s0}%6d ms  gap $gap%5d ms  [${spans.size}%2d st]  $names")
    }
    println(f"TOTAL: $dt%.3f s, ${byJob.size} jobs, ${l.spans.size} stages")
    spark.stop()
  }
}
