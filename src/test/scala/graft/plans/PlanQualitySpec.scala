package graft.plans

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale-quality rail over EVERY registered query's physical plan: an
  * unpartitioned window (Window.orderBy with no partitionBy) funnels the
  * whole input through one partition — the op11-class regression this
  * spec exists to catch. Global windows are tolerated only over
  * aggregated inputs (bucket-count offset tables, ranked node metrics —
  * tiny by construction).
  */
class PlanQualitySpec extends AnyFunSuite {

  private def hasAggregateBelow(p: SparkPlan): Boolean =
    p.collectFirst {
      case a if a.nodeName.toLowerCase.contains("aggregate") => a
    }.nonEmpty

  test("no gated query plans a global window over unaggregated input") {
    val offenders = graft.SparkEntry.all
      // dd08 drives an iterative loop whose returned plan is a checkpoint
      // scan; building it executes the whole algorithm — covered by its
      // own gate + spec, skip the (expensive) plan build here
      .filterNot(_.name == "dd08_dedup_clusters")
      .flatMap { q =>
        val plan =
          try q.fn(spark, sf).queryExecution.executedPlan
          catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
        plan.collect {
          case w: WindowExec
              if w.partitionSpec.isEmpty && !hasAggregateBelow(w.child) =>
            s"${q.name}: global Window over unaggregated input"
        }
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q_bucket_join joins the bucketed tables with no exchange below the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // AQE wraps the tree and hides pre-execution join children; plan
    // without it for the structural assertion (bucketing is a static
    // planning property, not a runtime one)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at the test SF the dimension side fits a broadcast, which would
    // bypass the bucketed path entirely — force the shuffle-family join
    // the bucketing claim is about (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.SparkEntry.all.find(_.name == "q_bucket_join").get
      val plan = q.fn(spark, sf).queryExecution.executedPlan
      val join: Option[SparkPlan] = plan.collectFirst {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(join.nonEmpty, s"no shuffle-family join planned:\n$plan")
      val exchangesBelow = join.get.collect { case e: ShuffleExchangeExec => e }
      assert(exchangesBelow.isEmpty,
        s"bucketed join still shuffles its inputs:\n${join.get}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("q_partition_prune's scan prunes to the filtered partitions") {
    val q = graft.SparkEntry.all.find(_.name == "q_partition_prune").get
    val df = q.fn(spark, sf)
    assert(
      graft.sources.Sources.prunesPartitions(df),
      "partition filter did not reach the scan:\n" +
        df.queryExecution.executedPlan.toString)
  }
}
