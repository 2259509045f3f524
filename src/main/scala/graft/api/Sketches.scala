package graft.api

import graft.{Portable => P}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The mergeable-sketch family as a callable library surface — the same
  * three sketches the gated queries prove correct (an17/an19 KMV
  * count-distinct, an20/an21 count-min frequency, an22/an23 k-min-sample
  * quantiles), exposed as build / merge / estimate triples the way dedup
  * exposes `passageNearDup`. Each sketch's state is a small DataFrame a
  * caller can persist to parquet between ingests; merge never re-reads
  * the data that built either side — the property that makes per-source
  * statistics affordable at 100 TB (1000 executors each fold a local
  * sketch, the driver merges k-row / d·w-cell states).
  *
  * Everything here is bit-portable (md5-derived 60-bit hashes via
  * [[graft.Portable.hash60]], wide-decimal integer estimators — never
  * engine-private HLL/GK state), so estimates hash-match across engines
  * and across build/merge paths. SketchesSpec pins API ≡ gated-query
  * output row-by-row, and the merge laws the gates prove (KMV/k-min
  * containment, CMS cell-wise linearity) are exactly what `*Merge`
  * relies on.
  *
  * Column contract: builds take the caller's key/item/value column names
  * and return canonical columns (`key`, `h`, `v` / `r`, `b`, `cnt`), so
  * states from different tables merge without renaming.
  */
object Sketches {

  private def cutK(df: DataFrame, k: Int): DataFrame = df
    .withColumn("rn", row_number().over(Window.partitionBy("key").orderBy("h")))
    .filter(col("rn") <= k)
    .drop("rn")

  // (k−1)·2⁶⁰ exceeds BIGINT for every useful k — the estimator divides
  // in DECIMAL(38,0), the an17 overflow convention (a quot/rem split
  // overflows whenever the kth hash is large; found and gated in r7).
  private def kmvEstExpr(k: Int, nCol: String, kthCol: String): String = {
    val num = (BigInt(k) - 1) * (BigInt(1) << 60)
    s"case when $nCol < $k then $nCol " +
      s"else cast(cast('$num' as decimal(38,0)) div $kthCol as bigint) end"
  }

  // ---------------------------------------------------------------- KMV

  /** KMV count-distinct state: per `key`, the `k` smallest distinct
    * 60-bit hashes of `item` (salted `kmv|`, matching the an17 gate).
    * State is ≤ k rows (key, h) per key — longs only, never the items.
    */
  def kmvBuild(df: DataFrame, key: String, item: String, k: Int = 32): DataFrame =
    cutK(
      df.selectExpr(s"$key as key",
          s"${P.hash60(s"concat('kmv|', $item)")} as h")
        .distinct(),
      k)

  /** Fold two KMV states: union → distinct → keep the k smallest. The
    * an19-gated containment theorem (the k smallest of a union live in
    * the union of each side's k smallest) makes this lossless — merged
    * estimates equal the from-scratch sketch, never approximately.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 32): DataFrame =
    cutK(a.unionByName(b).distinct(), k)

  /** Distinct-count estimate from a KMV state: (k−1)·2⁶⁰/h₍ₖ₎, exact
    * fallback below k. One row per key: (key, n_est).
    */
  def kmvEstimate(sketch: DataFrame, k: Int = 32): DataFrame = sketch
    .withColumn("rn", row_number().over(Window.partitionBy("key").orderBy("h")))
    .groupBy("key")
    .agg(count(lit(1)).cast("long").as("n_s"),
      max(when(col("rn") === k, col("h"))).as("kth"))
    .selectExpr("key", s"${kmvEstExpr(k, "n_s", "kth")} as n_est")

  // ---------------------------------------------------------- count-min

  private def cmsBucket(w: Int, rCol: String, itemCol: String): String =
    s"${P.hash60(s"concat('cms', cast($rCol as string), '|', $itemCol)")} % $w"

  /** Count-min frequency state: a d × w counter grid over the `item`
    * stream (bucket = salted 60-bit hash mod w, the an20 gate's grid).
    * State is ≤ d·w rows (r, b, cnt) regardless of corpus size — the
    * exact counts collapse map-side before the one exchange.
    */
  def cmsBuild(df: DataFrame, item: String, d: Int = 4, w: Int = 512): DataFrame = df
    .selectExpr(s"$item as w_")
    .groupBy("w_").agg(count(lit(1)).as("n"))
    .selectExpr("w_", "n", s"explode(sequence(0, ${d - 1})) as r")
    .selectExpr("r", s"${cmsBucket(w, "r", "w_")} as b", "n")
    .groupBy("r", "b").agg(sum("n").cast("long").as("cnt"))

  /** Fold two CMS states cell-wise by addition — counters are linear in
    * the input (the an21-gated law), so sharded grids sum to the full
    * grid exactly.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "b").agg(sum("cnt").cast("long").as("cnt"))

  /** Frequency estimates for `items` (a DataFrame with column `item`)
    * against a CMS state: min over the d probed cells — one-sided error,
    * estimate ≥ truth always. Returns (item, n_est). The grid ships
    * broadcast: it is ≤ d·w cells by construction.
    */
  def cmsEstimate(grid: DataFrame, items: DataFrame, item: String,
      d: Int = 4, w: Int = 512): DataFrame = items
    .selectExpr(s"$item as w_").distinct()
    .selectExpr("w_", s"explode(sequence(0, ${d - 1})) as r")
    .selectExpr("w_", "r", s"${cmsBucket(w, "r", "w_")} as b")
    .join(broadcast(grid), Seq("r", "b"))
    .groupBy("w_").agg(min("cnt").as("n_est"))
    .withColumnRenamed("w_", "item")

  // ------------------------------------------------------ k-min sample

  /** Quantile-sample state: per `key`, the `k` rows whose `id` has the
    * smallest salted 60-bit hash (`qs|`, the an22 gate's salt) — a
    * hash-ordered k-min cut IS a uniform random sample, mergeable by the
    * same containment theorem as KMV. State is ≤ k rows (key, v, h).
    */
  def quantileSampleBuild(df: DataFrame, key: String, value: String,
      id: String, k: Int = 16): DataFrame =
    cutK(
      df.selectExpr(s"$key as key", s"$value as v",
        s"${P.hash60(s"concat('qs|', cast($id as string))")} as h"),
      k)

  /** Fold two sample states: union → distinct → re-cut to the k
    * hash-smallest. Lossless for every quantile estimate (an23 gates it
    * row-by-row). The distinct makes the merge IDEMPOTENT like
    * [[kmvMerge]] — a row's hash identifies its doc, so overlapping or
    * re-delivered states collapse instead of double-counting (the
    * SketchesSpec tree-reduction law caught the original non-distinct
    * version shifting estimates on self-merge).
    */
  def quantileSampleMerge(a: DataFrame, b: DataFrame, k: Int = 16): DataFrame =
    cutK(a.unionByName(b).distinct(), k)

  /** p50/p90 estimates from a sample state by the gated positional rule:
    * value at rank (k+1) div 2 / (9k+9) div 10 of the sample sorted by
    * (v, hash-rank) — all-integer rank arithmetic, no float percentile
    * machinery. Keys with fewer than k rows degenerate to the exact
    * quantile by the same formula. Returns (key, k_eff, est_p50, est_p90).
    */
  def quantileSampleEstimate(sketch: DataFrame, k: Int = 16): DataFrame = sketch
    .withColumn("rn", row_number().over(Window.partitionBy("key").orderBy("h")))
    .filter(col("rn") <= k) // idempotent re-cut: estimate(merge(..)) needs no trim first
    .withColumn("cnt", count(lit(1)).over(Window.partitionBy("key")))
    .withColumn("k", expr(s"case when cnt < $k then cnt else $k end"))
    .withColumn("vr", row_number().over(
      Window.partitionBy("key").orderBy("v", "rn")))
    .groupBy("key")
    .agg(
      min("k").cast("long").as("k_eff"),
      max(expr("case when vr = (k + 1) div 2 then v end")).cast("long").as("est_p50"),
      max(expr("case when vr = (9 * k + 9) div 10 then v end")).cast("long").as("est_p90"))
}
