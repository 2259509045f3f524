package graft.functions

import graft.SparkTestSession.spark
import org.scalatest.funsuite.AnyFunSuite

/** TextQuality.backoffScore — every stupid-backoff branch pinned with
  * hand-computed integer values (the gated tx18 query pins the
  * cross-engine arithmetic on fixture data; this pins the semantics).
  *
  * Train corpus "a b c a b c": N = 6; C1(a)=C1(b)=C1(c)=2;
  * C2(a,b)=C2(b,c)=2, C2(c,a)=1; C3(a,b,c)=2, C3(b,c,a)=C3(c,a,b)=1.
  */
class BackoffScoreSpec extends AnyFunSuite {

  private def score(evalDocs: (Long, String)*): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val train = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val ev = evalDocs.toDF("doc_id", "text")
    TextQuality.backoffScore(train, ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("seen trigram scores 1e6*C3/C2 of its prefix bigram") {
    // (a,b,c): C3=2, C2(a,b)=2 → 1e6*2/2 = 1,000,000
    assert(score(1L -> "a b c") == Map(1L -> (1L, 1000000L)))
  }

  test("unseen trigram backs off to 0.4e6*C2/C1 of the trailing bigram") {
    // (x,b,c): trailing bigram (b,c) C2=2, C1(b)=2 → 400000*2/2
    assert(score(1L -> "x b c") == Map(1L -> (1L, 400000L)))
  }

  test("unseen bigram backs off to 0.16e6*C1/N of the last unigram") {
    // (x,y,c): C1(c)=2, N=6 → floor(160000*2/6) = 53,333
    assert(score(1L -> "x y c") == Map(1L -> (1L, 53333L)))
  }

  test("fully out-of-vocabulary trigram scores 0; branches sum per doc") {
    assert(score(1L -> "x y z") == Map(1L -> (1L, 0L)))
    // "a b c x y c": trigrams (a,b,c)=1e6, (b,c,x)=0.4e6*C2(c,x)?—(c,x)
    // unseen → unigram x unseen → 0; (c,x,y)=0; (x,y,c)=53333
    assert(score(1L -> "a b c x y c") ==
      Map(1L -> (4L, 1000000L + 0L + 0L + 53333L)))
  }

  test("docs shorter than 3 tokens produce no rows") {
    assert(score(1L -> "a b", 2L -> "a") == Map.empty)
  }
}
