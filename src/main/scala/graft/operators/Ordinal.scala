package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordinal — `row_number() OVER (ORDER BY key)` without
  * the single-partition global sort (the zipWithIndex composition):
  *
  *   1. bucket rows by key QUANTILE (order-preserving: every key in bucket
  *      i sorts before every key in bucket i+1; boundaries come from
  *      Spark's Greenwald-Khanna sketch, so buckets stay balanced no
  *      matter how skewed the key distribution is),
  *   2. rank inside each bucket with a partitioned window (parallel),
  *   3. add each bucket's exclusive prefix count, computed by windowing
  *      the ~`buckets`-row count table (tiny, driver-scale) and
  *      broadcast-joined back.
  *
  * Costs one extra key-column scan to size the buckets; the payload-sized
  * sort never crosses a partition boundary, so the plan survives 100×.
  * Quantile (not equal-width) boundaries matter at scale: a filter that
  * leaves the surviving ids clustered in 1% of the key range would pile
  * ~everything into one equal-width bucket and serialize the rank there —
  * quantile splits give each bucket ~n/buckets rows by construction. They
  * also avoid any (hi - lo) width arithmetic, which silently overflows
  * for full-range 64-bit keys.
  */
object Ordinal {

  /** Quantile split points for `keyCol` — the probe half of
    * [[withGlobalOrdinal]], exposed so instrumented callers can compute
    * splits on an UNINSTRUMENTED twin plan (an in-plan probe would fire
    * CollectMetrics observers a second time).
    */
  def quantileSplits(df: DataFrame, keyCol: String, buckets: Int): Array[Double] =
    if (buckets <= 1) Array.empty
    else df.stat.approxQuantile(
      keyCol, (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)

  /** @param splits precomputed quantile boundaries from [[quantileSplits]]
    *               — pass when an eager probe on `df` itself is
    *               unacceptable (e.g. the plan carries CollectMetrics
    *               observers that must fire once); when None, one
    *               key-column sketch pass sizes the buckets.
    * @param tieCols extra ascending order columns applied AFTER `keyCol`
    *               inside each bucket — `row_number() OVER (ORDER BY key,
    *               ties...)`. Correct with key-only bucketing because
    *               duplicate keys always share a bucket (strict `>`
    *               against the split points), so a tie group can never
    *               straddle a bucket boundary.
    */
  /** Bucket = number of split points strictly below the key: monotone in
    * the key (long→double casts are order-preserving), so bucket i's keys
    * all sort before bucket i+1's, and duplicate keys share a bucket.
    * NULL keys get bucket -1 (sorts before every real bucket — matching
    * row_number over an ASC order, nulls first); a null bucket key would
    * make the equi-join below DROP those rows, shifting every ordinal
    * after them.
    */
  private def bucketOf(keyCol: String, bs: Array[Double]): Column =
    if (bs.isEmpty) when(col(keyCol).isNull, lit(-1L)).otherwise(lit(0L))
    else when(col(keyCol).isNull, lit(-1L)).otherwise(
      aggregate(
        typedLit(bs.toSeq), lit(0L),
        (acc, s) => acc + when(col(keyCol).cast("double") > s, 1L).otherwise(0L)))

  def withGlobalOrdinal(df: DataFrame, keyCol: String, outCol: String,
      buckets: Int = 32, splits: Option[Array[Double]] = None,
      tieCols: Seq[String] = Nil): DataFrame = {
    val bs = splits.getOrElse(quantileSplits(df, keyCol, buckets))
    val withB = df.withColumn("_ord_b", bucketOf(keyCol, bs))
    val offsets = withB
      .groupBy("_ord_b")
      .agg(count(lit(1)).as("_ord_n"))
      // global window over ≤`buckets` rows — deliberately tiny
      .withColumn(
        "_ord_off",
        coalesce(
          sum("_ord_n").over(
            Window.orderBy("_ord_b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_ord_b", "_ord_off")
    withB
      .join(broadcast(offsets), "_ord_b")
      .withColumn(
        outCol,
        (col("_ord_off") +
          row_number().over(Window.partitionBy("_ord_b")
            .orderBy(col(keyCol) +: tieCols.map(col): _*))).cast("long"))
      .drop("_ord_b", "_ord_off")
  }

  /** Distributed global EXCLUSIVE running sum —
    * `sum(valueCol) OVER (ORDER BY key, ties... ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` (coalesced to 0) without the
    * single-partition global sort, by [[withGlobalOrdinal]]'s quantile
    * decomposition: the within-bucket exclusive prefix runs under a
    * PARTITIONED window, and each bucket adds the exclusive prefix TOTAL
    * of every earlier bucket — computed by windowing the ≤`buckets`-row
    * per-bucket sum table and broadcast-joined back. Exact: addition
    * associates, so global_prefix(r) = earlier-bucket total +
    * within-bucket prefix, and ties never straddle buckets (strict `>`
    * against the splits). The running-total shape this unlocks at scale:
    * sorted first-fit bin packing (q_file_compaction's manifest is
    * millions of files at 100 TB), CDF/coverage curves, equal-mass cuts.
    */
  def withGlobalPrefixSum(df: DataFrame, keyCol: String, valueCol: String,
      outCol: String, buckets: Int = 32,
      tieCols: Seq[String] = Nil): DataFrame = {
    val bs = quantileSplits(df, keyCol, buckets)
    val withB = df.withColumn("_ord_b", bucketOf(keyCol, bs))
    val offsets = withB
      .groupBy("_ord_b")
      .agg(sum(valueCol).as("_ord_s"))
      // global window over ≤`buckets` rows — deliberately tiny
      .withColumn(
        "_ord_off",
        coalesce(
          sum("_ord_s").over(
            Window.orderBy("_ord_b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_ord_b", "_ord_off")
    withB
      .join(broadcast(offsets), "_ord_b")
      .withColumn(
        outCol,
        (col("_ord_off") +
          coalesce(
            sum(valueCol).over(
              Window.partitionBy("_ord_b")
                .orderBy(col(keyCol) +: tieCols.map(col): _*)
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L))).cast("long"))
      .drop("_ord_b", "_ord_off")
  }
}
