package graft.functions

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public similarity APIs must agree exactly with the oracle-gated
  * queries whose plans they expose (the cross-check that caught the
  * round-4 nearDupCandidates divergence for dedup).
  */
class SimilarityApiSpec extends AnyFunSuite {

  private def sorted(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("srpNearDup equals the gated ss10 query") {
    val e = graft.Tables.embeddings(spark, sf)
    val api = Similarity.srpNearDup(e, "vec_id", "embedding").collect()
    val gated = graft.SparkEntry.queries("ss10_srp_neardup")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated),
      s"API ${api.length} pairs vs gated ${gated.length}")
    spark.catalog.clearCache()
  }

  test("cosineTopK equals the gated ss01 top-5") {
    val e = graft.Tables.embeddings(spark, sf)
    val api = Similarity
      .cosineTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .select("q_id", "rank", "n_id").collect()
    val gated = graft.SparkEntry.queries("ss01_topk_cosine")(spark, sf).collect()
    assert(api.length == 25)
    assert(sorted(api) == sorted(gated))
    spark.catalog.clearCache()
  }
}
