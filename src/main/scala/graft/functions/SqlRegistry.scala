package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Register-once gate for the graft SQL function surface (VERDICT r16
  * #6): every `X.register(spark)` call used to hit
  * `createOrReplaceTempFunction` unconditionally, so each query that
  * defensively registered its functions re-replaced them — idempotent,
  * but `SimpleFunctionRegistry` logs a "function replaced" WARN per
  * call, hundreds of lines per bench/test log a reader must scan past.
  *
  * The gate is keyed by SESSION (a WeakHashMap, so a closed session's
  * entry can be collected), not by probing the registry: a
  * `functionExists` probe would silently skip OUR registration if a
  * future Spark version ships a built-in under the same name — exactly
  * the shadowing bug a probe cannot distinguish from our own prior call.
  * First call per (session, name) registers; later calls are no-ops.
  */
private[graft] object SqlRegistry {
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  def registerOnce(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val names = registered.computeIfAbsent(spark,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    if (names.add(name))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }
}
