package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Column ⇄ Expression bridge for graft's custom Catalyst
  * expressions. Spark 4 made `classic.ExpressionUtils` private[sql]; an
  * extension library that defines native expressions needs exactly these
  * two hooks, so they are re-exported from inside the package — the same
  * pattern every Spark-native extension (Delta, Sedona, etc.) uses for
  * private[sql] surface.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a hand-built LogicalPlan — the hook a custom logical
    * operator (graft.plans.GroupedTopK) needs to hand its node back to the
    * session. `classic.Dataset.ofRows` is private[sql]; every plan-level
    * extension library re-exports it this way.
    */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** True when the session's SQL cache holds NO InMemoryRelations —
    * the observable half of graft.Caches' "no cached frames left behind"
    * contract (CacheManager is private[sql], hence bridged).
    */
  def sqlCacheIsEmpty(s: SparkSession): Boolean =
    s.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Idempotently register an extra planner strategy on a live session
    * (the `experimental` escape hatch, for sessions not built with
    * `withExtensions`; `GraftExtensions` covers the deployment path).
    */
  def addStrategy(s: SparkSession,
      st: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = s.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(st))
      exp.extraStrategies = exp.extraStrategies :+ st
  }

  /** Idempotently register an extra optimizer rule on a live session
    * (same escape hatch as [[addStrategy]]; extra optimizations run
    * after the built-in batches).
    */
  def addOptimization(s: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = s.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(r))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
