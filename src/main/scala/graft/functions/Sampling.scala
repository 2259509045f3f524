package graft.functions

import graft.{Portable => P}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling driver APIs — function-shaped entry points over the plans
  * the sm* queries pin (users call these; the queries carry the
  * oracles, and the gated sm04 rollup aggregates THIS machinery so API
  * and oracle can't diverge).
  */
object Sampling {

  /** Per-row keep flag for domain-mixture rebalancing toward a uniform
    * target at corpus/`shrink` size (sm04's machinery): per-source keep
    * probability min(1, quota/n_s) with quota = total div (shrink·nsrc),
    * realized deterministically as a hash-ppm threshold on the id — so
    * membership is stable across runs and retries. The input frame
    * keeps all its columns plus `kp` (1 or null).
    *
    * Scale: the fact table never shuffles — per-source counts are a
    * map-side-combined aggregation (nsrc rows), the ppm table
    * broadcasts back, the flag is a scan-local projection.
    */
  private[graft] def mixtureFlag(docs: DataFrame, idCol: String,
      sourceCol: String, shrink: Int): DataFrame = {
    require(shrink >= 1, s"shrink must be >= 1, got $shrink")
    val n = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_src"))
    val t = n.agg(sum("n_src").cast("bigint").as("total"),
      count(lit(1)).as("nsrc"))
    val p = n.crossJoin(broadcast(t))
      .selectExpr(sourceCol, "n_src",
        s"least(1000000, (1000000 * (total div ($shrink * nsrc))) div n_src) as keep_ppm")
      .drop("n_src")
    docs.join(broadcast(p), sourceCol)
      .withColumn("kp",
        when(expr(s"${P.hash60(s"concat('mix|', cast($idCol as string))")} % 1000000")
          < col("keep_ppm"), 1))
      .drop("keep_ppm")
  }

  /** Deterministically downsample toward a uniform source mixture at
    * corpus/`shrink` size. Returns the kept rows with their original
    * columns.
    */
  def mixtureSample(docs: DataFrame, idCol: String = "doc_id",
      sourceCol: String = "source", shrink: Int = 2): DataFrame =
    mixtureFlag(docs, idCol, sourceCol, shrink)
      .filter(col("kp") === 1).drop("kp")

  /** Group-aware train/valid/test assignment (sm02's 80/10/10 split by
    * source hash — every document of a source lands in the same split,
    * the leakage guard for near-duplicates within a crawl domain).
    */
  def assignSplit(docs: DataFrame, sourceCol: String = "source"): DataFrame =
    docs.withColumn("split",
      expr(graft.operators.SamplingOps.splitCaseFor(sourceCol)))
}
