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
      // the whole native-function family rides the same injection
      val d2 = ext.sql(
        "select l2_distance_sq(embedding, embedding) as d from emb3").collect()
      d2.foreach(row => assert(row.getDouble(0) == 0.0))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("winnow_fps rejects non-literal k/w with a clear analysis error") {
    val spark = graft.SparkTestSession.spark
    WinnowFingerprints.register(spark)
    graft.Tables.documents(spark, graft.SparkTestSession.sf).limit(5)
      .createOrReplaceTempView("docs_lit")
    val colK = intercept[Exception] {
      spark.sql("select winnow_fps(text, cast(doc_id as int), 4) from docs_lit").collect()
    }
    assert(colK.getMessage.contains("k must be an integer literal"))
    val strW = intercept[Exception] {
      spark.sql("select winnow_fps(text, 5, 'wide') from docs_lit").collect()
    }
    assert(strW.getMessage.contains("w must be an integer literal"))
    // fractional literals must fail loudly, not silently truncate 5.7 → 5
    val fracK = intercept[Exception] {
      spark.sql("select winnow_fps(text, 5.7, 4) from docs_lit").collect()
    }
    assert(fracK.getMessage.contains("k must be an integer literal"))
    val dblW = intercept[Exception] {
      spark.sql("select winnow_fps(text, 5, double(4.0)) from docs_lit").collect()
    }
    assert(dblW.getMessage.contains("w must be an integer literal"))
    // foldable literals still work, including arithmetic that folds
    assert(spark.sql("select winnow_fps(text, 5, 2 + 2) from docs_lit").count() == 5)
  }

  test("reservoir_sample rejects non-literal n/seed with a clear analysis error") {
    val spark = graft.SparkTestSession.spark
    ReservoirSample.register(spark)
    val bad = intercept[Exception] {
      spark.range(10).selectExpr("reservoir_sample(id, id)").collect()
    }
    assert(bad.getMessage.contains("n must be an integer literal"))
    val badSeed = intercept[Exception] {
      spark.range(10).selectExpr("reservoir_sample(id, 4, rand())").collect()
    }
    assert(badSeed.getMessage.contains("seed must be an integer literal"))
    assert(spark.range(10).selectExpr("reservoir_sample(id, 4, 7)").count() == 1)
  }
}
