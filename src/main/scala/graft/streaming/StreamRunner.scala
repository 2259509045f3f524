package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Genuine Structured Streaming path for the event-time analytics that
  * StreamingOps pins as batch oracles: file-source readStream → watermark →
  * tumbling-window agg → memory sink. StreamingSpec asserts the streaming
  * result equals the batch rendering — the exactly-once contract.
  *
  * At scale the same query runs against a Kafka/file stream with the
  * identical plan; watermark bounds state so the agg never grows unbounded.
  */
object StreamRunner {

  /** Run the st01 window aggregation as a real stream over the events
    * fixture; returns the collected result as a DataFrame.
    */
  def windowedAgg(spark: SparkSession, sfDir: String, queryName: String = "graft_stream"): DataFrame = {
    // raw on-disk schema (ts may be INT64 nanos under nanosAsLong) — the
    // stream reader must match the file, conversion happens after.
    val schema = graft.Tables.t(spark, sfDir, "events").schema
    // FileStreamSource requires a directory; the fixture table is a single
    // file, so stage a symlink dir (zero-copy).
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else {
        val d = java.nio.file.Files.createTempDirectory("graft-stream")
        java.nio.file.Files.createSymbolicLink(d.resolve("events.parquet"), src)
        d.toString
      }
    val stream = spark.readStream
      .schema(schema)
      .format("parquet")
      .load(streamDir)
    val normalized =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    val agg = normalized
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(
        unix_seconds(col("win.start")).as("win_start_s"),
        col("event_type"), col("n"), col("v"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
