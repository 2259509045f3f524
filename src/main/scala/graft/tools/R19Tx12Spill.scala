package graft.tools

import graft.metrics.StageMetricsListener
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Localize tx12's 100x spill (VERDICT r18 #5): derive the same Nx
  * documents fixture as ScaleSmoke (permuted alphabets, disjoint ids),
  * then time/measure the winnow pipeline in three cuts — fingerprints
  * only, the fp-bucket aggregation, and the full overlap query — so the
  * spill attributes to an operator instead of a query.
  *
  *   sbt 'runMain graft.tools.R19Tx12Spill [sfDir] [copies]'
  */
object R19Tx12Spill {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", (8 * copies / 10).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val dir = java.nio.file.Files.createTempDirectory("graft-tx12-spill").toString
    val docs = graft.Tables.documents(spark, sfDir)
    val bigDocs = (0 until copies).map { c =>
      val perm =
        if (c == 0) alpha
        else new scala.util.Random(c).shuffle(alpha.toList).mkString
      docs.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        translate(col("text"), alpha, perm).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    bigDocs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def measure(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val l = new StageMetricsListener
      val t0 = System.nanoTime()
      l.collect(spark) {
        mk.write.format("noop").mode("overwrite").save()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"$name%-28s ${dt}%8.2f s  shufW ${l.shuffleWriteBytes / 1e6}%9.1f MB" +
        f"  spill ${l.spillBytes / 1e6}%9.1f MB")
    }

    def fps = graft.functions.TextOps.winnowFps(
      graft.Tables.documents(spark, dir))
    measure("winnow_fps (no agg)")(fps)
    measure("fp buckets (collect_list)")(
      fps.groupBy("fp").agg(collect_list("doc_id").as("ds"))
        .select(size(col("ds")).as("n")))
    measure("full tx12 overlap")(graft.functions.TextOps.winnowOverlap(fps))
    // Tx12Diet's weighted variant (r5): buckets grouped by their sorted
    // doc list, pairs emitted once per DISTINCT list with multiplicity
    // weight — provably identical output (sum of weights = shared-fp
    // count). Rejected at 1x (+7.8% shuffle, flat wall); re-adjudicated
    // here at Nx where duplicated corpora make lists repeat massively.
    measure("weighted list variant")(
      fps.groupBy("fp").agg(collect_list("doc_id").as("ds"))
        .filter(size(col("ds")).between(2, 64))
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
        .filter(col("n_shared") >= 5))
    spark.stop()
  }
}
