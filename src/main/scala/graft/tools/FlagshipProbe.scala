package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: flagship throughput in isolation, to separate code
  * regressions from bench-tail JVM state (the full Bench measures the
  * flagship LAST, after ~200 queries of heap churn — observed ~15%
  * lower there than in isolation). The rate definition — lineitem row
  * count over one flagship pass's wall time — is copied from
  * Bench.scala's own flagshipRate so the two numbers are commensurable.
  */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    for (i <- 1 to 4) {
      val df = graft.api.Flagship.run(spark, sf)
      // noop materialization — commensurable with Bench's r16 methodology
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"flagship rep $i: ${n / dt}%.0f elems/s")
    }
  }
}
