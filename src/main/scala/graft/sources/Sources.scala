package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format coverage beyond parquet: csv, json, text — the
  * TextLineDataset/TFRecord analogues in Spark's own format vocabulary —
  * plus partitioned parquet writes whose reads prune partitions
  * (`PartitionFilters` in the scan; SourcesSpec asserts pruning).
  *
  * At 100 TB, partitioning is the coarse pruning lever (date/tenant
  * columns) that works before any row-group statistics are consulted;
  * a query filtering one partition of a 1000-partition table reads 0.1 %
  * of the files.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** TextLineDataset analogue: one row per line, `value` column. */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet write: one directory per value of
    * `partitionCol`.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True iff a filter on the partition column reached the scan as a
    * partition filter (i.e., non-matching directories are never opened).
    */
  def prunesPartitions(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    // FileSourceScanExec prints PartitionFilters: [...] — non-empty when
    // directory pruning applies
    val idx = plan.indexOf("PartitionFilters: [")
    idx >= 0 && plan.charAt(idx + "PartitionFilters: [".length) != ']'
  }
}
