package graft.functions

import graft.SparkTestSession.spark
import org.scalatest.funsuite.AnyFunSuite

/** Dedup.canonicalizeUrls — every spelling of the same page folds to
  * one canonical form, and genuinely different pages stay distinct
  * (the gated dd19 query pins the cross-engine grouping; this pins the
  * user-facing normal form).
  */
class UrlCanonSpec extends AnyFunSuite {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    Dedup.canonicalizeUrls(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url"))
      .orderBy("doc_id")
      .collect()
      .map(_.getAs[String]("canon_url"))
      .toSeq
  }

  test("all spellings of one page share one canonical form") {
    val forms = canon(
      "https://news.example.com/a/1",
      "https://www.news.example.com/a/1/",
      "HTTPS://NEWS.EXAMPLE.COM/A/1?utm_source=feed&utm_medium=rss",
      "https://news.example.com/a/1#section-2")
    assert(forms.distinct == Seq("https://news.example.com/a/1"))
  }

  test("different pages do not collapse") {
    val forms = canon(
      "https://news.example.com/a/1",
      "https://news.example.com/a/2",
      "https://blog.example.com/a/1",
      "http://news.example.com/a/1") // different scheme survives
    assert(forms.distinct.size == 4)
  }

  test("non-utm query strings survive canonicalization") {
    val forms = canon(
      "https://shop.example.com/item?id=42",
      "https://shop.example.com/item?id=43",
      "https://shop.example.com/item?utm_campaign=x")
    assert(forms(0) == "https://shop.example.com/item?id=42")
    assert(forms(1) == "https://shop.example.com/item?id=43")
    assert(forms(2) == "https://shop.example.com/item")
  }
}
