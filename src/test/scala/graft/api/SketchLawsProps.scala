package graft.api

import graft.SparkTestSession.spark
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import spark.implicits._

/** Randomized merge-law checks for the sketch family (sbt runs
  * ScalaCheck `Properties` natively). SketchesSpec pins the APIs against
  * the oracle-gated queries on the FIXTURE corpus; these properties
  * assert the same laws on arbitrary small corpora, where the
  * adversarial shapes live: duplicate-heavy streams, empty shards,
  * single-row sides, every split point of a shard boundary. Each law is
  * exactly what the 100 TB deployment relies on — per-executor states
  * folded pairwise in any order must equal the from-scratch sketch.
  * Case counts stay small (each evaluation runs real Spark jobs); the
  * value ranges are collision-heavy on purpose (0..40 over up to 120
  * draws) so dup handling is exercised in nearly every case.
  */
object SketchLawsProps extends Properties("SketchLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  private val items: Gen[List[Long]] =
    Gen.choose(0, 120).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 40L)))

  private def keyed(xs: List[Long]): DataFrame =
    xs.toDF("x").selectExpr("'k' as key", "x")

  private def kmvEst(state: DataFrame, k: Int): Map[String, Long] =
    Sketches.kmvEstimate(state, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  // KMV: merged shards == from-scratch, for any two (even overlapping or
  // empty) item streams — the an19 containment theorem, randomized.
  property("kmvMerge equals the from-scratch sketch") =
    forAll(items, items) { (a, b) =>
      val k = 8
      val merged = Sketches.kmvMerge(
        Sketches.kmvBuild(keyed(a), "key", "x", k),
        Sketches.kmvBuild(keyed(b), "key", "x", k), k)
      kmvEst(merged, k) == kmvEst(Sketches.kmvBuild(keyed(a ++ b), "key", "x", k), k)
    }

  // KMV: below k distinct items the estimator must be EXACT (the gated
  // n_s < k fallback), at any duplication level.
  property("kmvEstimate is exact below k") = forAll(items) { a =>
    val k = 64 // value range caps distincts at 41 < k
    val want =
      if (a.isEmpty) Map.empty[String, Long]
      else Map("k" -> a.distinct.size.toLong)
    kmvEst(Sketches.kmvBuild(keyed(a), "key", "x", k), k) == want
  }

  // CMS: estimates are one-sided (>= truth) on a deliberately tiny
  // 2x16 grid (collisions near-certain), and sharded grids merged
  // cell-wise equal the from-scratch grid exactly (an21 linearity).
  property("cms one-sided error + cell-wise merge linearity") =
    forAll(items, items) { (a, b) =>
      val (d, w) = (2, 16)
      def grid(xs: List[Long]) = Sketches.cmsBuild(xs.toDF("x"), "x", d, w)
      def cells(g: DataFrame) = g.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val all = a ++ b
      val merged = Sketches.cmsMerge(grid(a), grid(b))
      val linear = cells(merged) == cells(grid(all))
      val truth = all.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
      val est = Sketches.cmsEstimate(merged, all.toDF("x"), "x", d, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      linear && truth.forall { case (v, n) => est(v) >= n }
    }

  // k-min quantile sample: splitting one id-keyed corpus at ANY point
  // and merging the shard states reproduces the from-scratch estimates
  // (an23's law at a random boundary), and self-merge is a no-op
  // (idempotence — re-delivered shard states must not shift estimates).
  property("quantile sample: shard-merge lossless, self-merge idempotent") =
    forAll(items, Gen.choose(0.0, 1.0)) { (vs, f) =>
      val k = 8
      val xs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      def build(rows: List[(Long, Long)]) = Sketches.quantileSampleBuild(
        rows.toDF("id", "v").selectExpr("'k' as key", "id", "v"),
        "key", "v", "id", k)
      def est(s: DataFrame) = Sketches.quantileSampleEstimate(s, k)
        .collect().map(_.toSeq.map(String.valueOf)).toSet
      val (l, r) = xs.splitAt((xs.size * f).toInt)
      val full = build(xs)
      val merged = Sketches.quantileSampleMerge(build(l), build(r), k)
      est(merged) == est(full) &&
        est(Sketches.quantileSampleMerge(full, full, k)) == est(full)
    }
}
