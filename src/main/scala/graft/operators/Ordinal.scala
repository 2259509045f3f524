package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordinal — `row_number() OVER (ORDER BY key)` without
  * the single-partition global sort (the zipWithIndex composition):
  *
  *   1. bucket rows by key QUANTILE (order-preserving: every key in bucket
  *      i sorts before every key in bucket i+1; boundaries come from
  *      Spark's Greenwald-Khanna sketch for numeric keys and from a
  *      RangePartitioner-style bounded sample for string keys, so
  *      buckets stay balanced no matter how skewed the key
  *      distribution is),
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

  /** Fixed equal-width split points for a key that is a 60-bit
    * `Portable.hash60` value (r19): md5-derived keys are uniform on
    * [0, 2⁶⁰), so equal-width IS equal-mass and the quantile probe —
    * an EAGER full key-column scan + sketch aggregation per
    * withGlobalOrdinal call — buys nothing (sm15 paid it three times,
    * once per epoch). The ordinal's VALUE is exact for any split set
    * (splits place bucket boundaries, the rank reconstructs the global
    * order regardless); a non-uniform key fed these splits would only
    * unbalance buckets, never corrupt the ordinal. Use ONLY for
    * hash60-shaped keys.
    */
  def hash60Splits(buckets: Int = 32): Array[Double] =
    if (buckets <= 1) Array.empty
    else (1 until buckets).map(i =>
      math.pow(2, 60) * i.toDouble / buckets).toArray

  /** Sampled split points for a STRING `keyCol` (VERDICT r17 #2) —
    * approxQuantile's Greenwald-Khanna sketch is numeric-only, so string
    * keys size their buckets the way `RangePartitioner` does
    * (Partitioner.scala in Spark core, public source): sample a bounded
    * number of keys, sort, pick ≤ buckets-1 evenly spaced boundary
    * strings. The collect is DRIVER-BOUNDED by `sampleTarget` (~64k
    * strings) regardless of corpus size — the same contract
    * RangePartitioner relies on at any scale — and costs one key-column
    * scan (count + sample), matching the numeric path's sketch pass.
    *
    * The driver-side sort uses unsigned UTF-8 byte order
    * (`Arrays.compareUnsigned`), matching Spark's in-engine UTF8String
    * comparison under the default UTF8_BINARY collation — Java's own
    * String ordering diverges on supplementary characters (UTF-16
    * surrogates sort below U+E000..U+FFFF, UTF-8 bytes sort above).
    * Correctness does not hinge on it — [[withGlobalOrdinal]]'s bucket
    * id is `count(splits < key)` under the ENGINE's comparison, which is
    * monotone in the key whatever order the split array is in — but a
    * mis-sorted sample would pick boundary strings that no longer
    * equi-partition the distribution.
    */
  def sampledStringSplits(df: DataFrame, keyCol: String, buckets: Int,
      sampleTarget: Int = 65536): Array[String] = {
    if (buckets <= 1) return Array.empty
    val keys = df.select(col(keyCol).cast("string").as(keyCol))
      .where(col(keyCol).isNotNull)
    val n = keys.count()
    if (n == 0) return Array.empty
    val fraction = math.min(1.0, sampleTarget.toDouble / n)
    val utf8 = Ordering.comparatorToOrdering[String]((a, b) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")))
    val sample = keys.sample(withReplacement = false, fraction, seed = 0x5eedL)
      .collect().map(_.getString(0)).sorted(utf8)
    if (sample.isEmpty) Array.empty
    else (1 until buckets)
      .map(i => sample(((i.toLong * sample.length) / buckets).toInt
        .min(sample.length - 1)))
      .distinct.toArray
  }

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
    * @param partitionCols NON-NULL columns that reset the ordinal —
    *               `row_number() OVER (PARTITION BY p ORDER BY key,
    *               ties...)` for EVERY partition value in one pass (r19:
    *               ss17 stacks its two ranking arms instead of running
    *               the probe + offsets + window machinery twice). The
    *               bucket boundaries still come from ONE key sketch over
    *               the whole frame — mixing partitions can only
    *               unbalance buckets, never corrupt the rank, because
    *               the offsets table and the in-bucket window both key
    *               by (partition, bucket) and the ordinal's value is
    *               split-independent. The offsets table stays tiny:
    *               |partition values| × buckets rows. NULLs in a
    *               partition column would DROP its rows at the offsets
    *               equi-join — callers pass literals or verified
    *               non-null keys. Empty (the default) takes the exact
    *               pre-r19 plan shape.
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

  /** String twin of [[bucketOf]]: count of boundary strings strictly
    * below the key under the engine's UTF8_BINARY comparison — the same
    * collation `orderBy` ranks with inside each bucket, so bucket i's
    * keys all sort before bucket i+1's and duplicate keys share a
    * bucket (strict `>`), exactly the numeric invariants.
    */
  private def bucketOfStr(keyCol: String, bs: Array[String]): Column =
    if (bs.isEmpty) when(col(keyCol).isNull, lit(-1L)).otherwise(lit(0L))
    else when(col(keyCol).isNull, lit(-1L)).otherwise(
      aggregate(
        typedLit(bs.toSeq), lit(0L),
        (acc, s) => acc + when(col(keyCol).cast("string") > s, 1L).otherwise(0L)))

  /** Dispatch on the key's dtype: numeric keys bucket by GK-sketch
    * quantiles, string keys by sampled boundaries
    * ([[sampledStringSplits]]). Either way the payload never crosses a
    * partition for the rank — closing VERDICT r17 #2's funnel, where a
    * string-keyed positional zip fell back to a single-partition global
    * window.
    */
  private def bucketColumn(df: DataFrame, keyCol: String, buckets: Int,
      splits: Option[Array[Double]],
      strSplits: Option[Array[String]]): Column =
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        bucketOfStr(keyCol,
          strSplits.getOrElse(sampledStringSplits(df, keyCol, buckets)))
      case _ =>
        bucketOf(keyCol, splits.getOrElse(quantileSplits(df, keyCol, buckets)))
    }

  def withGlobalOrdinal(df: DataFrame, keyCol: String, outCol: String,
      buckets: Int = 32, splits: Option[Array[Double]] = None,
      tieCols: Seq[String] = Nil,
      strSplits: Option[Array[String]] = None,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val withB = df.withColumn("_ord_b",
      bucketColumn(df, keyCol, buckets, splits, strSplits))
    val bKeys = partitionCols :+ "_ord_b"
    val offWindow =
      if (partitionCols.isEmpty) Window.orderBy("_ord_b")
      else Window.partitionBy(partitionCols.map(col): _*).orderBy("_ord_b")
    val offsets = withB
      .groupBy(bKeys.map(col): _*)
      .agg(count(lit(1)).as("_ord_n"))
      // window over ≤ |partitions|×buckets rows — deliberately tiny
      .withColumn(
        "_ord_off",
        coalesce(
          sum("_ord_n").over(offWindow.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select((bKeys :+ "_ord_off").map(col): _*)
    withB
      .join(broadcast(offsets), bKeys)
      .withColumn(
        outCol,
        (col("_ord_off") +
          row_number().over(Window.partitionBy(bKeys.map(col): _*)
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
    val withB = df.withColumn("_ord_b",
      bucketColumn(df, keyCol, buckets, None, None))
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
