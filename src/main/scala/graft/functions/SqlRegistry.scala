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
  * The gate is keyed by the session's FUNCTION-REGISTRY INSTANCE (a
  * WeakHashMap, so a dropped registry's entry can be collected), not by
  * the session and not by probing the registry: a `functionExists` probe
  * would silently skip OUR registration if a future Spark version ships
  * a built-in under the same name — exactly the shadowing bug a probe
  * cannot distinguish from our own prior call — and a session-keyed
  * latch (ADVICE r17) would stay latched if the session's registry is
  * ever cleared or replaced externally, turning later register() calls
  * into no-ops that surface as inexplicable "undefined function"
  * failures. Keying on the registry object means a replaced registry is
  * a fresh key and naturally re-registers. First call per
  * (registry, name) registers; later calls are no-ops.
  */
private[graft] object SqlRegistry {
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
      java.util.Set[String]]())

  def registerOnce(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val names = registered.computeIfAbsent(
      spark.sessionState.functionRegistry,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    if (names.add(name))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }
}
