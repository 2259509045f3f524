package graft.functions

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing (MOSS) fingerprint properties: the w+k-1 match guarantee,
  * selection density, and the overlap query's consistency with the
  * fingerprint set it joins.
  */
class WinnowSpec extends AnyFunSuite {
  import spark.implicits._

  test("docs sharing a span >= w+k-1 chars share a fingerprint") {
    // k=12, w=8: guarantee threshold is 19 normalized chars. The shared
    // span below is 40 chars embedded in otherwise-disjoint text.
    val shared = "the quick brown fox jumps over a lazy dog"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"one two three four five $shared six seven eight"),
      (3L, "completely unrelated content with nothing in common at all here")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFps(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared 40-char span must collide")
    assert((fps(1L) & fps(3L)).isEmpty || (fps(2L) & fps(3L)).isEmpty,
      "unrelated doc should not share fingerprints with both")
  }

  test("winnowing selects at most one fp per position and covers windows") {
    // selection density: distinct fps per doc is bounded by the number of
    // k-gram positions, and every window of w positions contributes one —
    // so a doc with n positions has between ceil((n-w+1)/w) and n fps.
    val docs = graft.Tables.documents(spark, sf)
    val n = docs.count()
    val stats = TextOps.winnowFps(docs)
      .groupBy("doc_id").count().collect()
    assert(stats.length == n, "every doc long enough yields fingerprints")
    assert(stats.forall(_.getLong(1) > 0))
  }

  test("declarative winnowing matches a direct reference on random text") {
    // reference: literal Schleimer/Wilkerson/Aiken selection — rolling
    // hash every k-gram, take the min of each w-window (min value; the
    // plan's window-min dedups to the same SET of selected hashes)
    val K = 12; val W = 8; val P = 2147483647L
    def refFps(text: String): Set[Long] = {
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      if (norm.length < K + W - 1) return Set.empty
      val hs = (0 to norm.length - K).map { i =>
        (0 until K).foldLeft(0L)((acc, j) => (acc * 256 + norm(i + j).toLong) % P)
      }
      hs.sliding(W).map(_.min).toSet
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta,",
        "eta", "theta.", "iota", "kappa", "the", "of", "and", "12", "x")
      val docs = (1L to 20L).map { id =>
        id -> Seq.fill(5 + rnd.nextInt(60))(words(rnd.nextInt(words.size))).mkString(" ")
      }
      val got = TextOps.winnowFps(docs.toDF("doc_id", "text")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      docs.foreach { case (id, text) =>
        assert(got.getOrElse(id, Set.empty[Long]) == refFps(text),
          s"seed=$seed doc=$id")
      }
    }
  }

  test("Dedup.winnowCandidates API equals the gated tx12 query") {
    val docs = graft.Tables.documents(spark, sf)
    val api = Dedup.winnowCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gated = graft.SparkEntry.queries("tx12_winnow_overlap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(api.nonEmpty && api == gated)
    spark.catalog.clearCache()
  }

  test("tx12 pairs each share >= 5 fingerprints from the tx11 set") {
    val fps = graft.SparkEntry.queries("tx11_winnow_fingerprints")(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val pairs = graft.SparkEntry.queries("tx12_winnow_overlap")(spark, sf).collect()
    assert(pairs.nonEmpty)
    // the capped join can only undercount shared fps (boilerplate fps are
    // skipped), so the full-set intersection is >= the query's n_shared
    assert(pairs.forall { r =>
      (fps(r.getLong(0)) & fps(r.getLong(1))).size >= r.getLong(2)
    })
    spark.catalog.clearCache()
  }
}
