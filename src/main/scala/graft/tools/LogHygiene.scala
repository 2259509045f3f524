package graft.tools

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Silences WindowExec's "No Partition Defined for Window operation"
  * WARN in graft's own entry points (VERDICT r17 #4 — the r16
  * registry-spam fix, same bar: hundreds of identical warning lines in
  * every BENCH/test tail LOOK like scale-killers and bury real
  * warnings).
  *
  * Why suppression rather than partitioning the windows by a constant:
  * every remaining unpartitioned-window emitter in src/main is a
  * deliberately tiny frame — the ≤`buckets`-row prefix-offset tables in
  * Ordinal (Ordinal.scala), the ≤6-row ranked analysis tables
  * (AnalysisQueries.scala), and the n/16384-row VAD block-stitch frame
  * (MultimodalOps.scala) — where a single partition is the intended
  * shape. A `partitionBy(lit(0))` would be shape-preserving, but Spark
  * 4's `EliminateWindowPartitions` optimizer rule folds constant
  * partition keys away, so the warning returns; a non-foldable dummy
  * key would pollute 160 pinned plans to dodge a log line.
  *
  * This does NOT hide real scale problems: PlanQualitySpec's rails
  * inspect the physical plans themselves and forbid corpus-sized
  * unpartitioned WindowExecs, so the warning carries no signal a rail
  * does not already enforce — what's left of it is pure noise.
  */
object LogHygiene {
  def suppressTinyFrameWindowWarnings(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
