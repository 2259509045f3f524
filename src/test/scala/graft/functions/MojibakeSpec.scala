package graft.functions

import graft.SparkTestSession.spark
import org.scalatest.funsuite.AnyFunSuite

/** TextQuality.fixMojibake — repair of cp1252-mis-decoded UTF-8 on
  * known-positive and known-negative rows (the gated tx20 query pins
  * the cross-engine arithmetic; this pins the user-facing semantics).
  */
class MojibakeSpec extends AnyFunSuite {

  private def run(texts: String*) = {
    import spark.implicits._
    TextQuality.fixMojibake(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect()
  }

  test("corrupted sequences are counted and mapped back") {
    val rows = run(
      "the cafÃ© serves a great rÃ©sumÃ© workshop",
      "donâ€™t panic â€” itâ€™s fine",
      "clean ascii stays untouched")

    val r0 = rows(0)
    assert(r0.getAs[Long]("n_moji") == 3) // 3 × Ã©
    assert(r0.getAs[Boolean]("has_moji"))
    assert(r0.getAs[String]("repaired") ==
      "the café serves a great résumé workshop")

    val r1 = rows(1)
    assert(r1.getAs[Long]("n_moji") == 3) // 2 × â€™ + 1 × â€”
    assert(r1.getAs[String]("repaired") == "don’t panic — it’s fine")

    val r2 = rows(2)
    assert(r2.getAs[Long]("n_moji") == 0)
    assert(!r2.getAs[Boolean]("has_moji"))
    assert(r2.getAs[String]("repaired") == "clean ascii stays untouched")
  }

  test("already-correct unicode is not double-repaired") {
    // text that ALREADY contains the intended chars must pass through
    val rows = run("café — don’t naïve")
    assert(rows(0).getAs[Long]("n_moji") == 0)
    assert(rows(0).getAs[String]("repaired") == "café — don’t naïve")
  }

  test("longest-first order: 3-byte sequences repair before 2-byte ones") {
    // 'â€™' contains no repairable 2-byte subsequence after the 3-byte
    // pass runs first; mixed text repairs every family independently
    val rows = run("mixÃ©d â€™ and Ã¯ â€” end")
    assert(rows(0).getAs[Long]("n_moji") == 4)
    assert(rows(0).getAs[String]("repaired") == "mixéd ’ and ï — end")
  }
}
