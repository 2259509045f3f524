package graft.functions

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {

  private val foldSql =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (p, v) -> p + v) / " +
      "sqrt(aggregate(zip_with(a, a, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (p, v) -> p + v) * " +
      "aggregate(zip_with(b, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (p, v) -> p + v))"

  test("bit-identical to the composable SQL fold on real embeddings") {
    CosineSimilarity.register(spark)
    val e = graft.Tables.embeddings(spark, sf)
    val pairs = e.select(col("vec_id").as("ai"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("bi"), col("embedding").as("b")))
      .filter(col("ai") < 20 && col("bi") < 20)
    val both = pairs.selectExpr(
      "ai", "bi",
      "cosine_similarity(a, b) as native",
      s"$foldSql as fold").collect()
    assert(both.length == 400)
    both.foreach { r =>
      val (n, f) = (r.getDouble(2), r.getDouble(3))
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(f),
        s"pair (${r.getLong(0)},${r.getLong(1)}): native=$n fold=$f")
    }
  }

  test("codegen and interpreted paths agree") {
    CosineSimilarity.register(spark)
    val df = spark.sql(
      "select cosine_similarity(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(2.0 as float), cast(4.0 as float))) as c")
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
    // interpreted path via nullSafeEval directly
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(math.abs(expr.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("zero vector yields null; type mismatch is rejected") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "select cosine_similarity(array(cast(0.0 as float)), array(cast(1.0 as float))) as c")
      .head()
    assert(r.isNullAt(0))
    val bad = intercept[Exception] {
      spark.sql("select cosine_similarity(array(1.0d), array(2.0d))").head()
    }
    assert(bad.getMessage.toLowerCase.contains("cosine_similarity") ||
      bad.getMessage.contains("array<float>"))
  }
}
