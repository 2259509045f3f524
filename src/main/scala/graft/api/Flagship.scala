package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SURVEY §7.3 minimum end-to-end slice: a ResNet-shaped pipeline
  * (scan → map → filter → shuffle → batch(128) → take) over the lineitem
  * fixture — ops 1, 6, 7, 11, 8, 13 of §2.a in one plan.
  *
  * This is the driver's smoke `entry`; the same pipeline expressed through
  * the graft IR (with instrumentation + optimizer) runs in PipelineSpec.
  */
object Flagship {
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val mapped = li.selectExpr(
      "l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice * (1 - l_discount) as revenue")
    val filtered = mapped.filter(col("revenue") > 1000.0)
    // seeded deterministic shuffle key (buffer-shuffle superset)
    val shuffled = filtered.withColumn(
      "skey",
      (col("l_orderkey") * 2654435761L + col("l_linenumber") * 40503L) % 999983L)
    val w = Window.partitionBy(col("l_orderkey") % 8).orderBy("skey", "l_orderkey", "l_linenumber")
    val batched = shuffled
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", floor((col("rn") - 1) / 128))
      .groupBy(col("l_orderkey") % 8 as "shard", col("batch_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("qty"),
        sum(col("revenue")).as("revenue"))
    batched.orderBy("shard", "batch_id").limit(64)
  }
}
