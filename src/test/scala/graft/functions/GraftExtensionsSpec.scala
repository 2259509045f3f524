package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_similarity is available via SparkSessionExtensions injection") {
    val prev = graft.SparkTestSession.spark // ensure the shared context exists
    // getOrCreate returns the default session and ignores withExtensions,
    // so clear the defaults to force a genuinely new session (same
    // SparkContext), then restore.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        "select cosine_similarity(array(cast(3.0 as float)), array(cast(7.0 as float))) as c")
        .head().getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      // and it composes with real data through the extension-built session
      val e = graft.Tables.embeddings(ext, graft.SparkTestSession.sf).limit(3)
      e.createOrReplaceTempView("emb3")
      val self = ext.sql(
        "select cosine_similarity(embedding, embedding) as c from emb3").collect()
      self.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-9))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
