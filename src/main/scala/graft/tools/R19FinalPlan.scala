package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 final-plan probe (measurement-only, not in any query path):
  * EXECUTE a query to the noop sink, then print its post-execution
  * adaptive plan (isFinalPlan=true), where AQE's runtime stage reuse is
  * visible as ReusedQueryStage / ReusedExchange nodes — the evidence the
  * pre-execution `explain("formatted")` dumps cannot show. Used to
  * adjudicate whether textually repeated subtrees (ss20's exact arm,
  * ss24's candidate set, ss29's two codebook broadcasts) actually
  * re-execute or dedup at runtime.
  *
  *   sbt 'runMain graft.tools.R19FinalPlan <q1,q2,...> [sfDir]'
  */
object R19FinalPlan {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("ss29_bitext_margin"))
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
    val outDir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(outDir)
    val byName = graft.SparkEntry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      byName.get(n) match {
        case None => System.err.println(s"[finalplan] unknown query: $n")
        case Some(q) =>
          val df = q.fn(spark, sfDir)
          // collect(), not the noop sink: the sink wraps the plan in a
          // SEPARATE write QueryExecution, so df.queryExecution would
          // print an unexecuted (isFinalPlan=false) plan with no runtime
          // reuse nodes. collect() drives the dataset's OWN execution;
          // outputs here are oracle-gated small result tables.
          df.collect()
          val s = df.queryExecution.executedPlan.toString
          java.nio.file.Files.writeString(outDir.resolve(s"${n}_final.txt"), s)
          val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(s).size
          val bx = "BroadcastQueryStage|BroadcastExchange".r.findAllIn(s).size
          val sx = "ShuffleQueryStage".r.findAllIn(s).size
          println(s"[finalplan] $n reuse_nodes=$reused broadcast_nodes=$bx " +
            s"shuffle_stages=$sx -> plans/r19/${n}_final.txt")
          spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
