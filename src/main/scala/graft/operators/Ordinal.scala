package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordinal — `row_number() OVER (ORDER BY key)` without
  * the single-partition global sort (the zipWithIndex composition):
  *
  *   1. bucket rows by key RANGE (order-preserving: every key in bucket i
  *      sorts before every key in bucket i+1),
  *   2. rank inside each bucket with a partitioned window (parallel),
  *   3. add each bucket's exclusive prefix count, computed by windowing
  *      the ~`buckets`-row count table (tiny, driver-scale) and
  *      broadcast-joined back.
  *
  * Costs one extra min/max scan to size the buckets; the payload-sized
  * sort never crosses a partition boundary, so the plan survives 100×.
  */
object Ordinal {

  /** @param bounds precomputed (min, max) of the key — pass when an eager
    *               probe on `df` itself is unacceptable (e.g. the plan
    *               carries CollectMetrics observers that must fire once);
    *               when None, one min/max scan sizes the buckets.
    */
  def withGlobalOrdinal(df: DataFrame, keyCol: String, outCol: String,
      buckets: Int = 32, bounds: Option[(Long, Long)] = None): DataFrame = {
    val (lo, hi) = bounds.getOrElse {
      val mm = df.agg(
        min(col(keyCol)).cast("long").as("lo"),
        max(col(keyCol)).cast("long").as("hi")).head()
      if (mm.isNullAt(0)) return df.withColumn(outCol, lit(null).cast("long"))
      (mm.getLong(0), mm.getLong(1))
    }
    val width = math.max(1L, (hi - lo) / buckets + 1)
    // NULL keys get bucket -1 (sorts before every real bucket — matching
    // row_number over an ASC order, nulls first); a plain div expression
    // would give them a null bucket and the equi-join below would DROP
    // those rows, shifting every ordinal after them.
    val withB = df.withColumn(
      "_ord_b",
      expr(s"case when $keyCol is null then -1L " +
        s"else (cast($keyCol as bigint) - ${lo}L) div ${width}L end"))
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
          row_number().over(Window.partitionBy("_ord_b").orderBy(col(keyCol)))).cast("long"))
      .drop("_ord_b", "_ord_off")
  }
}
