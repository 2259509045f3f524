package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flood smoke for the adaptive hot-cell splitter (VERDICT r17 #6): the
  * Lloyd min_by splitter (SimilarityOps.semDedupCellsAdaptive) is
  * spec-tested, but nothing MEASURED showed a hot SemDeDup cell getting
  * split under a real flood with the pair stage staying ≈ Nx. This tool
  * builds a flooded fixture — the dd04/dd21 template-flood pattern,
  * applied to embeddings: a 400-vector organic corpus plus F near-copies
  * of ONE vector (tiny deterministic per-copy displacement, so the flood
  * has geometry to split on), all landing in one codebook cell — at
  * F=200 (1x) and F=2000 (10x), and measures the PLAIN pair stage
  * against the ADAPTIVE one on both legs.
  *
  * The claim under test: the plain cell-keyed self-join is quadratic in
  * the hot cell (10x flood → ~100x pair rows), while the adaptive
  * variant splits the hot cell to ≤ targetCellSize members first, so
  * its pair volume and shuffle stay ≈ Nx — the splitter turns a
  * quadratic cliff into extra linear passes. Writes its own
  * "## Adaptive hot-cell splitter under flood" section into SCALE.md
  * (replaced in place on re-run; never touches other sections).
  */
object AdaptiveFloodSmoke {

  private def fmt(b: Long): String =
    if (b >= (1L << 30)) f"${b / (1024.0 * 1024 * 1024)}%.2f GiB"
    else if (b >= (1L << 20)) f"${b / (1024.0 * 1024)}%.1f MiB"
    else if (b >= (1L << 10)) f"${b / 1024.0}%.1f KiB"
    else s"$b B"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.tools.LogHygiene.suppressTinyFrameWindowWarnings()

    val base = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 400)
      .select("vec_id", "label", "embedding")
    val cent = graft.operators.SimilarityOps.trainedCentroids(base)
      .persist()
    cent.count()

    // the flood: F near-copies of vec_id 0's vector, displaced by a
    // tiny deterministic per-(copy, dim) amount — all land in the same
    // cell, but carry enough geometry for a Lloyd pass to separate.
    // TWO coprime moduli make every copy's displacement pattern distinct
    // (a single small modulus collapses the flood to modulus-many unique
    // points and the splitter provably cannot get cells below F/modulus
    // — the first cut of this fixture did exactly that with %7)
    val seed = base.filter(col("vec_id") === 0)
      .select(col("embedding").as("be")).limit(1)
    def flooded(f: Int) = base.select("vec_id", "embedding").unionByName(
      spark.range(f).crossJoin(broadcast(seed)).selectExpr(
        "10000000 + id as vec_id",
        "transform(be, (x, i) -> cast(x " +
          "+ 0.0002 * ((id * 31 + i * 17) % 101) " +
          "+ 0.00003 * ((id * 7 + i * 29) % 89) as float)) as embedding"))

    final case class Leg(rows: Long, kept: Long, pairs: Long, shuffle: Long,
        wall: Double, cells: Long, maxCell: Long, hot: Boolean)
    def measure(f: Int, adaptive: Boolean): Leg = {
      spark.sharedState.cacheManager.clearCache()
      val corpus = flooded(f)
      val l = new graft.metrics.StageMetricsListener
      val t0 = System.nanoTime()
      var rows = 0L; var kept = 0L; var pairs = 0L
      l.collect(spark) {
        val ledger =
          if (adaptive) graft.functions.Similarity.semDedupCellsAdaptive(
            corpus, cent, targetCellSize = 64)
          else graft.functions.Similarity.semDedupCells(corpus, cent)
        val agg = ledger.agg(count(lit(1)), sum("keep_flag")).collect()(0)
        rows = agg.getLong(0); kept = agg.getLong(1)
        // the pair stage's ACTUAL volume: Σ n·(n-1)/2 over the final
        // cells — this is where a flood detonates (the explosion happens
        // inside the cell-keyed join AFTER the exchange, so shuffle
        // bytes alone understate it); the ledger's assignment is
        // persisted by both variants, so this second action is cheap
        pairs = ledger.groupBy("cell").agg(count(lit(1)).as("n"))
          .selectExpr("cast(sum(n * (n - 1) / 2) as bigint) as p")
          .collect()(0).getLong(0)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val (c, mx, _) = graft.operators.SimilarityOps.lastCellStats
        .getOrElse((0L, 0L, 0.0))
      Leg(rows, kept, pairs, l.shuffleWriteBytes, dt, c, mx,
        graft.operators.SimilarityOps.lastHotCellFlagged)
    }

    def timed(tag: String)(leg: => Leg): Leg = {
      val r = leg
      println(f"[flood] $tag: rows=${r.rows} pairs=${r.pairs} " +
        f"shuffle=${fmt(r.shuffle)} wall=${r.wall}%.1f s cells=${r.cells} " +
        f"maxCell=${r.maxCell} hot=${r.hot}")
      r
    }
    val p1 = timed("plain 1x")(measure(200, adaptive = false))
    val pN = timed("plain 10x")(measure(2000, adaptive = false))
    val a1 = timed("adaptive 1x")(measure(200, adaptive = true))
    val aN = timed("adaptive 10x")(measure(2000, adaptive = true))

    val sb = new StringBuilder
    sb ++= "\n## Adaptive hot-cell splitter under flood (ss25's adaptive variant, measured)\n\n"
    sb ++= s"Fixture: 400 organic sf0.01 vectors + F near-copies of one vector\n"
    sb ++= "(deterministic tiny displacement), all in ONE codebook cell; F=200\n"
    sb ++= "(1x) vs F=2000 (10x), same k=10 trained codebook on both legs,\n"
    sb ++= "targetCellSize=64. The plain cell-keyed pair stage is quadratic in\n"
    sb ++= "the hot cell; the adaptive splitter (Lloyd sub-assignment via\n"
    sb ++= "min_by, commit 70994ba) must split it first and keep the pair\n"
    sb ++= "stage ≈ Nx.\n\n"
    sb ++= "| variant | candidate pairs 1x/10x | pair ratio | shuffle 1x/10x | wall 1x/10x | post-run cells 1x/10x | max cell 1x/10x | hot flag 1x/10x |\n"
    sb ++= "|---|---|---|---|---|---|---|---|\n"
    sb ++= f"| plain semDedupCells | ${p1.pairs} / ${pN.pairs} | ${pN.pairs.toDouble / math.max(p1.pairs, 1L)}%.1fx | ${fmt(p1.shuffle)} / ${fmt(pN.shuffle)} | ${p1.wall}%.1f / ${pN.wall}%.1f s | ${p1.cells} / ${pN.cells} | ${p1.maxCell} / ${pN.maxCell} | ${p1.hot} / ${pN.hot} |\n"
    sb ++= f"| adaptive (target 64) | ${a1.pairs} / ${aN.pairs} | ${aN.pairs.toDouble / math.max(a1.pairs, 1L)}%.1fx | ${fmt(a1.shuffle)} / ${fmt(aN.shuffle)} | ${a1.wall}%.1f / ${aN.wall}%.1f s | ${a1.cells} / ${aN.cells} | ${a1.maxCell} / ${aN.maxCell} | ${a1.hot} / ${aN.hot} |\n"
    sb ++= "\nCandidate pairs (Σ n·(n-1)/2 over final cells) are the quadratic\n"
    sb ++= "signal — the explosion happens inside the cell-keyed join AFTER\n"
    sb ++= "the exchange, so shuffle bytes alone understate a flood. The\n"
    sb ++= "plain variant's hot cell holds the whole flood (guard FLAGGED at\n"
    sb ++= "10x) and its pair volume pays the square of F; the adaptive\n"
    sb ++= "variant splits the flood to ≈ target-sized sub-cells BEFORE\n"
    sb ++= "pairing, so its pair volume stays ≈ Nx — the splitter converts\n"
    sb ++= "the quadratic cliff into extra linear passes, the ss25 remedy\n"
    sb ++= "contract at 100 TB. Fixture-scale walls on the adaptive legs are\n"
    sb ++= "dominated by per-round job scheduling (dozens of small jobs per\n"
    sb ++= "split round, constant in corpus size — they amortize at\n"
    sb ++= "production row counts); the pair/shuffle columns are the\n"
    sb ++= "corpus-size signals.\n"

    // splice: replace a previous same-header section in place; insert
    // before the first "## Derived" section so ScaleSmoke's kind-keyed
    // splice never claims it
    val path = java.nio.file.Paths.get("SCALE.md")
    val existing =
      if (java.nio.file.Files.exists(path)) java.nio.file.Files.readString(path)
      else ""
    val header = "\n## Adaptive hot-cell splitter under flood"
    val cleaned = {
      val i = existing.indexOf(header)
      if (i < 0) existing
      else {
        val rest = existing.substring(i + 1)
        val j = rest.indexOf("\n## ")
        existing.substring(0, i) + (if (j < 0) "" else rest.substring(j))
      }
    }
    val insertAt = cleaned.indexOf("\n## Derived ")
    val out =
      if (insertAt < 0) cleaned + sb.toString
      else cleaned.substring(0, insertAt) + sb.toString +
        cleaned.substring(insertAt)
    java.nio.file.Files.writeString(path, out)
    println(f"plain   1x/10x shuffle ${fmt(p1.shuffle)} -> ${fmt(pN.shuffle)} " +
      f"(${pN.shuffle.toDouble / math.max(p1.shuffle, 1L)}%.1fx), " +
      f"maxCell ${p1.maxCell} -> ${pN.maxCell}, hot ${p1.hot}/${pN.hot}")
    println(f"adaptive 1x/10x shuffle ${fmt(a1.shuffle)} -> ${fmt(aN.shuffle)} " +
      f"(${aN.shuffle.toDouble / math.max(a1.shuffle, 1L)}%.1fx), " +
      f"maxCell ${a1.maxCell} -> ${aN.maxCell}, hot ${a1.hot}/${aN.hot}")
    spark.stop()
  }
}
