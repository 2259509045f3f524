package graft.tools

import graft.metrics.StageMetricsListener
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure-first experiment for tx12's shuffle diet (SCALE.md's worst
  * shuffle/scan ratio, 23.9× at sf0.1). Compares the shipped
  * pair-explode formulation against a weighted distinct-doc-list
  * variant: overlapping documents share RUNS of winnow fingerprints, so
  * many fp buckets hold the exact same doc list — the variant groups
  * buckets by their (sorted) list, emits each list's pairs ONCE with a
  * multiplicity weight, and sums weights instead of counting rows.
  * Output is provably identical (sum of per-list weights = count of
  * shared fps); only the pair-row volume changes.
  *
  *   sbt 'runMain graft.tools.Tx12Diet [sfDir]'
  *
  * Prints wall time + shuffle bytes for both and asserts equal results.
  * Per VERDICT r5 #6 the variant lands only if it moves tx12 > 20% at
  * sf0.1; the measured delta is recorded in SCALE.md either way.
  */
object Tx12Diet {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fps = graft.functions.TextOps.winnowFps(
      graft.Tables.documents(spark, sfDir))

    def current(): DataFrame = graft.functions.TextOps.winnowOverlap(fps)

    def weighted(minShared: Int = 5, cap: Int = 64): DataFrame =
      fps
        .groupBy("fp").agg(collect_list("doc_id").as("ds"))
        // drop singleton buckets BEFORE the list-dedup shuffle too
        .filter(size(col("ds")).between(2, cap))
        .selectExpr("array_sort(ds) as ds2")
        .groupBy("ds2").agg(count(lit(1)).as("w"))
        .selectExpr(
          "explode(flatten(transform(sequence(1, size(ds2) - 1), " +
            "i -> transform(slice(ds2, i + 1, size(ds2) - i), " +
            "b -> struct(element_at(ds2, i) as a_id, b as b_id))))) as pr",
          "w")
        .selectExpr("pr.a_id as a_id", "pr.b_id as b_id", "w")
        .groupBy("a_id", "b_id")
        .agg(sum("w").as("n_shared"))
        .filter(col("n_shared") >= minShared)

    def measure(name: String, mk: () => DataFrame): (Long, Double) = {
      // warm-up (codegen + FS cache)
      mk().count()
      spark.sharedState.cacheManager.clearCache()
      val l = new StageMetricsListener
      val t0 = System.nanoTime()
      l.collect(spark) {
        mk().write.format("noop").mode("overwrite").save()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"$name%-10s shuffle=${l.shuffleWriteBytes / 1048576.0}%.2f MiB  wall=$dt%.2f s")
      (l.shuffleWriteBytes, dt)
    }

    val a = measure("current", () => current())
    val b = measure("weighted", () => weighted())
    // second rep to damp host noise on the wall numbers
    val a2 = measure("current", () => current())
    val b2 = measure("weighted", () => weighted())

    val cur = current().orderBy("a_id", "b_id").collect().toSeq
    val alt = weighted().orderBy("a_id", "b_id").collect().toSeq
    require(cur.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      alt.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
      s"variant diverges: ${cur.size} vs ${alt.size} rows")
    println(s"results identical (${cur.size} rows)")
    println(f"shuffle delta: ${100.0 * (a._1 - b._1) / a._1}%.1f%%  " +
      f"wall delta (min of 2): ${100.0 * (math.min(a._2, a2._2) - math.min(b._2, b2._2)) / math.min(a._2, a2._2)}%.1f%%")
    spark.stop()
  }
}
