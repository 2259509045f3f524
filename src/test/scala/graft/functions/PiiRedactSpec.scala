package graft.functions

import graft.SparkTestSession.spark
import org.scalatest.funsuite.AnyFunSuite

/** TextQuality.redactPii — detection counts and redaction output on
  * known-positive and known-negative rows (the gated tx17 query pins the
  * cross-engine arithmetic; this pins the user-facing semantics).
  */
class PiiRedactSpec extends AnyFunSuite {

  private def run(texts: String*) = {
    import spark.implicits._
    TextQuality.redactPii(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect()
  }

  test("emails, IPv4s, and 555-phones are counted and redacted") {
    val rows = run(
      "reach me at jane.doe+x@corp.example.org or on 555-0142 ok",
      "servers 10.0.0.1 and 192.168.12.255 are up",
      "plain text with no pii at all")
    val r0 = rows(0)
    assert(r0.getAs[Int]("n_emails") == 1)
    assert(r0.getAs[Int]("n_phones") == 1)
    assert(r0.getAs[Int]("n_ipv4") == 0)
    assert(r0.getAs[Boolean]("has_pii"))
    assert(r0.getAs[String]("redacted") ==
      "reach me at <EMAIL> or on <PHONE> ok")

    val r1 = rows(1)
    assert(r1.getAs[Int]("n_ipv4") == 2)
    assert(r1.getAs[String]("redacted") == "servers <IP> and <IP> are up")

    val r2 = rows(2)
    assert(r2.getAs[Int]("n_emails") == 0 && r2.getAs[Int]("n_ipv4") == 0 &&
      r2.getAs[Int]("n_phones") == 0)
    assert(!r2.getAs[Boolean]("has_pii"))
    assert(r2.getAs[String]("redacted") == "plain text with no pii at all")
  }

  test("word boundaries hold: partial tokens do not match") {
    // digits glued to words, a 5-part dotted quad, and a long phone tail
    val rows = run("version1.2.3.4.5 build x555-0142y not4.3.2.1ip")
    val r = rows(0)
    // "x555-0142y" has word chars on both sides, so \b rejects the phone;
    // in "version1.2.3.4.5" the scan can't start at the glued '1' but CAN
    // start after the first dot — exactly one match ("2.3.4.5");
    // "not4.3.2.1ip" never closes a 4-group quad on a boundary
    assert(r.getAs[Int]("n_phones") == 0)
    assert(r.getAs[Int]("n_ipv4") == 1)
  }

  test("multiple matches of every kind redact in one pass") {
    val rows = run("a@b.co c@d.io 10.1.1.1 555-0000 555-9999")
    val r = rows(0)
    assert(r.getAs[Int]("n_emails") == 2)
    assert(r.getAs[Int]("n_ipv4") == 1)
    assert(r.getAs[Int]("n_phones") == 2)
    assert(r.getAs[String]("redacted") ==
      "<EMAIL> <EMAIL> <IP> <PHONE> <PHONE>")
  }
}
