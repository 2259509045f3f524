package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffle a table once at write time so future joins and
  * aggregations on the bucket key run shuffle-free — the 100 TB answer to
  * "this join shuffles every run". BucketingSpec asserts the joined plan
  * contains no shuffle exchange.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket count:
    * Catalyst recognizes the co-partitioning and plans a SortMergeJoin
    * with zero Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")
}

/** Skew handling: salted join for hot keys. AQE's skew-join split handles
  * most cases at runtime; explicit salting is the deterministic fallback
  * when a handful of keys dominate (e.g. a header row joined by billions
  * of detail rows).
  *
  * Left (large, skewed) rows get `salt = hash(row) % n`; the right
  * (smaller) side is replicated n×; the join key becomes (key, salt) —
  * splitting each hot key's rows across n reducers.
  */
object SkewTools {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn(
      "_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicatedRight = right.withColumn(
      "_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
