package graft.functions

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class L2DistanceSpec extends AnyFunSuite {

  private val foldSql =
    "aggregate(zip_with(a, b, (x, y) -> (cast(x as double) - cast(y as double)) * " +
      "(cast(x as double) - cast(y as double))), cast(0 as double), (p, v) -> p + v)"

  test("bit-identical to the composable SQL fold on real embeddings") {
    L2DistanceSq.register(spark)
    val e = graft.Tables.embeddings(spark, sf)
    val pairs = e.select(col("vec_id").as("ai"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("bi"), col("embedding").as("b")))
      .filter(col("ai") < 20 && col("bi") < 20)
    val both = pairs.selectExpr(
      "ai", "bi",
      "l2_distance_sq(a, b) as native",
      s"$foldSql as fold").collect()
    assert(both.length == 400)
    both.foreach { r =>
      val (n, f) = (r.getDouble(2), r.getDouble(3))
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(f),
        s"pair (${r.getLong(0)},${r.getLong(1)}): native=$n fold=$f")
    }
  }

  test("mixed float x double matches the widened fold (ss15's centroid distance)") {
    L2DistanceSq.register(spark)
    val e = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").as("a"))
      .selectExpr(
        "vec_id", "a",
        "transform(sequence(1, 64), i -> cast(i as double) / 7.0 - 4.0) as b")
    val both = e.selectExpr(
      "vec_id",
      "l2_distance_sq(a, b) as native",
      s"$foldSql as fold").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} fold=${r.getDouble(2)}")
    }
  }

  test("codegen and interpreted paths agree; empty arrays give 0.0") {
    L2DistanceSq.register(spark)
    val df = spark.sql(
      "select l2_distance_sq(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(4.0 as double), cast(6.0 as double))) as d")
    assert(df.head().getDouble(0) == 25.0)
    val expr = L2DistanceSq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0, 6.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null).asInstanceOf[Double] == 25.0)
    // mismatched lengths → NULL (zip_with pads the short side with
    // NULLs, nulling the fold)
    val mismatch = spark.sql(
      "select l2_distance_sq(array(cast(1.0 as float)), " +
        "array_remove(array(cast(2.0 as double)), cast(2.0 as double))) as d")
    assert(mismatch.head().isNullAt(0))
    // a NULL element also nulls the distance
    val nullElem = spark.sql(
      "select l2_distance_sq(array(cast(1.0 as float), cast(null as float)), " +
        "array(cast(2.0 as double), cast(3.0 as double))) as d")
    assert(nullElem.head().isNullAt(0))
  }

  test("non-numeric element types are rejected") {
    L2DistanceSq.register(spark)
    val bad = intercept[Exception] {
      spark.sql("select l2_distance_sq(array(1, 2), array(3, 4))").head()
    }
    assert(bad.getMessage.toLowerCase.contains("l2_distance_sq") ||
      bad.getMessage.contains("array<float|double>"))
  }
}
