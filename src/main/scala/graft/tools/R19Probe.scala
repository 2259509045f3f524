package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 optimization probe: for each named query, dump the formatted
  * physical plan to plans/r19/<name>_<tag>.txt and measure noop-sink wall
  * time plus task-metric totals (jobs, stages, shuffle read/write, spill)
  * with a fresh [[graft.metrics.StageMetricsListener]] per timed rep.
  *
  *   sbt 'runMain graft.tools.R19Probe <tag> <q1,q2,...> [sfDir] [reps]'
  *
  * Methodology matches Bench: same session confs, same warm-up, noop-sink
  * materialization, min over reps, cacheManager cleared between reps.
  */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("cu01_curation_ledger"))
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(3).flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(3)
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

    // Bench-identical warm-up: JIT + codegen + FS cache.
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    graft.SparkEntry.all.find(_.name == "q3_top_revenue_orders").foreach(q =>
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () })

    val outDir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(outDir)
    val byName = graft.SparkEntry.all.map(q => q.name -> q).toMap

    val rows = names.flatMap { n =>
      byName.get(n) match {
        case None => System.err.println(s"[probe] unknown query: $n"); None
        case Some(q) =>
          spark.sparkContext.setJobDescription(s"r19probe:$n")
          val plan = q.fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), plan)
          // untimed warmup rep
          try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[probe] $n failed: ${e.getMessage}")
          }
          spark.sharedState.cacheManager.clearCache()
          val samples = (1 to reps).map { _ =>
            val l = new graft.metrics.StageMetricsListener
            val t0 = System.nanoTime()
            l.collect(spark) {
              q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            }
            val dt = (System.nanoTime() - t0) / 1e9
            spark.sharedState.cacheManager.clearCache()
            (dt, l.spans.map(_.jobId).distinct.size, l.spans.size,
              l.shuffleReadBytes, l.shuffleWriteBytes, l.spillBytes)
          }
          val best = samples.minBy(_._1)
          Some((n, best, samples.map(_._1)))
      }
    }
    println("%-28s %8s %6s %7s %10s %10s %9s  all reps"
      .format("query", "min_s", "jobs", "stages", "shufR_MB", "shufW_MB", "spill_MB"))
    rows.foreach { case (n, (dt, jobs, stages, sr, sw, sp), all) =>
      println(f"$n%-28s ${dt}%8.3f $jobs%6d $stages%7d ${sr / 1e6}%10.2f " +
        f"${sw / 1e6}%10.2f ${sp / 1e6}%9.2f  " +
        all.map(t => f"$t%.3f").mkString(","))
    }
    println("TOTAL min: " + f"${rows.map(_._2._1).sum}%.3f s over ${rows.size} queries")
    spark.stop()
  }
}
