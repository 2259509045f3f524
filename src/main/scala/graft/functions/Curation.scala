package graft.functions

import graft.{Portable => P}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation driver API — the cu01 plan as a function (the gated
  * query calls THIS, so API and oracle can't diverge). See
  * `graft.operators.CurationOps` for the full semantics and scale notes.
  */
object Curation {

  /** Per-document curation ledger: predicted language, quality verdict,
    * exact-dup keeper flag, near-dup cluster + keeper flag, content-hash
    * split, and the final `kept` verdict — one row per input document,
    * one scan, every signal reusing its gated query's machinery.
    * `WHERE kept` is the training corpus; dropped rows carry the reason.
    */
  def ledger(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    val docs = docs0.select(
      col(idCol).as("doc_id"), col(textCol).as("text"),
      col(sourceCol).as("source"))
    val labels = graft.operators.DedupOps.clusterLabels(docs)
    // every signal expression is the SHARED snippet its standalone
    // gated query runs (sparkLangScores/Case = tx01, isQuality = tx05,
    // sparkSplitCase = sm02) — the ledger assembles, never re-derives
    val base = docs
      .selectExpr("doc_id", "text", "source",
        "split(lower(text), '\\\\s+') as ltoks")
      .selectExpr("doc_id" +: "text" +: "source" +: TextOps.sparkLangScores: _*)
      .withColumn("pred_lang", expr(TextOps.sparkLangCase))
      .withColumn("is_quality", TextQuality.isQuality("text"))
      .selectExpr(
        "doc_id", "pred_lang", "is_quality",
        s"${P.hash60("text")} as digest",
        s"${graft.operators.SamplingOps.sparkSplitCase} as split")
      .selectExpr("*",
        "doc_id = min(doc_id) over (partition by digest) as exact_keep")
    base.join(labels, "doc_id")
      .selectExpr(
        "doc_id", "pred_lang", "is_quality", "exact_keep", "cluster_id",
        "cluster_id = doc_id as near_keep", "split",
        "is_quality and exact_keep and cluster_id = doc_id as kept")
      .withColumnRenamed("doc_id", idCol)
  }
}
