package graft.operators

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class MlDedupSpec extends AnyFunSuite {

  test("MLlib MinHashLSH finds self-consistent near-dup candidates") {
    val docs = graft.Tables.documents(spark, sf)
    val pairs = MlDedup.nearDupPairs(docs, maxDistance = 0.9).cache()
    val n = pairs.count()
    // deterministic under the fixed seed: same run twice → same pairs
    val again = MlDedup.nearDupPairs(docs, maxDistance = 0.9)
    assert(again.count() == n)
    // distances are valid Jaccard distances
    val bad = pairs.filter("dist < 0 or dist > 1").count()
    assert(bad == 0)
    // a document unioned with itself must be found at distance 0
    val withDup = docs.limit(1).unionByName(docs.limit(1))
      .selectExpr("monotonically_increasing_id() as doc_id", "text")
    val dupPairs = MlDedup.nearDupPairs(withDup, maxDistance = 0.1)
    assert(dupPairs.filter("dist = 0").count() >= 1)
  }
}
