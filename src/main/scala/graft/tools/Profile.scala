package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for slow queries: runs one named query with
  * timing splits and prints the formatted plan.
  * sbt 'runMain graft.tools.Profile <queryName> <sfDir>'
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dd04_lsh_candidate_pairs")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("=== PLAN ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(8000))
    val n = df.count() // rows untimed; timing materializes fully (r16)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"=== run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
