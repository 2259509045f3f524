package graft.operators

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

/** The curation ledger must agree signal-by-signal with the standalone
  * gated queries whose machinery it composes — the ledger is an
  * assembly, never a reimplementation.
  */
class CurationSpec extends AnyFunSuite {

  test("cu01 ledger agrees with tx01/tx05/dd08 and its own kept rule") {
    val rows = graft.SparkEntry.queries("cu01_curation_ledger")(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length == n, "one ledger row per document")

    val lang = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    val tx01 = graft.SparkEntry.queries("tx01_langid")(spark, sf)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang == tx01, "pred_lang diverged from tx01")

    val quality = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val tx05 = graft.SparkEntry.queries("tx05_quality_filter")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(quality == tx05, "is_quality diverged from tx05")

    val clusters = rows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    val dd08 = graft.SparkEntry.queries("dd08_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == dd08, "cluster_id diverged from dd08")

    // kept ≡ is_quality ∧ exact_keep ∧ near_keep, and near_keep ≡
    // (cluster_id = doc_id) — the ledger's own consistency rule
    assert(rows.forall { r =>
      r.getBoolean(7) == (r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(5)) &&
        r.getBoolean(5) == (r.getLong(4) == r.getLong(0))
    })
    spark.catalog.clearCache()
  }

  test("Curation.ledger accepts renamed id/text/source columns") {
    import org.apache.spark.sql.functions.col
    val renamed = graft.Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"),
        col("source").as("origin"))
    val out = graft.functions.Curation
      .ledger(renamed, idCol = "id", textCol = "body", sourceCol = "origin")
    assert(out.columns.head == "id")
    assert(out.count() == graft.Tables.documents(spark, sf).count())
    spark.catalog.clearCache()
  }
}
