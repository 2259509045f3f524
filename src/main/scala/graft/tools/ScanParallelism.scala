package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway r18 probe: scan partition counts + per-stage task counts for
  * the heavy-projection queries.
  */
object ScanParallelism {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("documents", "embeddings", "lineitem", "orders", "events")) {
      val df = if (t == "events") graft.Tables.events(spark, sfDir)
        else graft.Tables.t(spark, sfDir, t)
      println(s"$t: rows=${df.count()} rddParts=${df.rdd.getNumPartitions}")
    }
    // row-group structure of documents.parquet
    val fs = new java.io.File(s"$sfDir").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    fs.foreach(f => println(s"file ${f.getName}: ${f.length()} bytes"))
    spark.stop()
  }
}
