package graft.profiling

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class DataProfilerSpec extends AnyFunSuite {

  test("one-pass profile: counts, ranges, quantiles per column") {
    val li = graft.Tables.lineitem(spark, sf)
    val p = DataProfiler.profile(li)
    assert(p.rows == 6000)
    val byName = p.columns.map(c => c.column -> c).toMap
    assert(byName.keySet == li.columns.toSet)
    val qty = byName("l_quantity")
    assert(qty.nulls == 0)
    assert(qty.min.contains("1.0") && qty.max.contains("50.0"))
    assert(qty.quantiles.size == 4 && qty.quantiles(1) >= qty.quantiles(0))
    val flag = byName("l_returnflag")
    assert(flag.approxDistinct >= 2 && flag.approxDistinct <= 4) // A/N/R
    assert(flag.quantiles.isEmpty)
    // top-k on the low-cardinality column
    val top = DataProfiler.topK(li, "l_returnflag", 3)
    assert(top.size == 3 && top.map(_._2).sum == 6000)
    // and the profile converts to a DataFrame for reporting
    assert(DataProfiler.toDF(spark, p).count() == li.columns.length)
  }

  test("profile survives array-typed columns (embeddings)") {
    val p = DataProfiler.profile(graft.Tables.embeddings(spark, sf))
    val emb = p.columns.find(_.column == "embedding").get
    assert(emb.dataType.startsWith("array"))
    assert(emb.nulls == 0 && emb.quantiles.isEmpty && emb.min.isEmpty)
    assert(emb.approxDistinct > 400) // 500 distinct vectors
  }

  test("quality filter + dedup driver APIs compose") {
    val docs = graft.Tables.documents(spark, sf)
    val q = graft.functions.TextQuality.filterQuality(docs)
    assert(q.count() > 0 && q.count() <= docs.count())
    val deduped = graft.functions.Dedup.exact(docs, "text", "doc_id")
    assert(deduped.count() == docs.select("text").distinct().count())
    val pairs = graft.functions.Dedup.nearDupCandidates(docs, "doc_id", "text")
    // matches the dd04 oracle-gated plan
    val dd04 = graft.SparkEntry.queries("dd04_lsh_candidate_pairs")(spark, sf)
    assert(pairs.count() == dd04.count())
  }

  test("connected components: min-label per component, singletons self-label") {
    import spark.implicits._
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,6}; singletons 4, 7
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("a", "b")
    val got = graft.functions.Dedup.connectedComponents(nodes, pairs, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 4L -> 4L, 7L -> 7L))
  }
}
