package graft.operators

import graft.SparkTestSession.spark
import org.scalatest.funsuite.AnyFunSuite

/** ss10 inlines its SRP hyperplanes as foldable double literals computed
  * at plan-build time (SimilarityOps.srpPlane); the DuckDB oracle derives
  * the same values in SQL. This spec pins the cross-language identity:
  * every inlined component must be BIT-identical to what the engine's own
  * md5/conv/double pipeline produces — the property the oracle hash gate
  * rests on.
  */
class SimilarityPlanesSpec extends AnyFunSuite {

  test("srpPlane matches the engine-evaluated md5 derivation bit-for-bit") {
    val rows = spark.range(0, 32).toDF("p")
      .selectExpr("cast(p as int) as p", "explode(sequence(1, 64)) as i")
      .selectExpr(
        "p", "i",
        "cast(cast(conv(substring(md5(concat(cast(p as string), '|', cast(i as string))), 1, 15), 16, 10) as bigint) as double)" +
          " / 576460752303423488.0d - 1.0d as h")
      .collect()
    assert(rows.length == 32 * 64)
    rows.foreach { r =>
      val (p, i, h) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      val mine = SimilarityOps.srpPlane(p, i)
      assert(java.lang.Double.doubleToLongBits(mine) ==
        java.lang.Double.doubleToLongBits(h),
        s"plane ($p,$i): scala=$mine engine=$h")
    }
  }

  test("inlined planes round-trip through the SQL literal parser") {
    val vals = Seq(SimilarityOps.srpPlane(0, 1), SimilarityOps.srpPlane(31, 64),
      SimilarityOps.srpPlane(7, 33))
    val parsed = spark.sql(
      s"select ${vals.map(v => s"${v}d").mkString(", ")}").head()
    vals.zipWithIndex.foreach { case (v, idx) =>
      assert(java.lang.Double.doubleToLongBits(parsed.getDouble(idx)) ==
        java.lang.Double.doubleToLongBits(v))
    }
  }
}
