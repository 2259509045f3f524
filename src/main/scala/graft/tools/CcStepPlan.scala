package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the FIRST in-loop CC star round's formatted plan (VERDICT r18
  * #3 evidence gap): run clusterLabels at the given sf with the
  * ccStepPlanSink hook set, writing plans/r19/cc_star_step.txt.
  *
  *   sbt 'runMain graft.tools.CcStepPlan [sfDir]'
  */
object CcStepPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans/r19/cc_star_step.txt")
    java.nio.file.Files.createDirectories(out.getParent)
    graft.functions.Dedup.ccStepPlanSink = Some(out)
    graft.operators.DedupOps.clusterLabels(
      graft.Tables.documents(spark, sfDir))
      .write.format("noop").mode("overwrite").save()
    println("wrote " + out + ", rounds=" + graft.functions.Dedup.lastCcRounds)
    spark.stop()
  }
}
