package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made ExpressionUtils
  * private[sql]; this shim lives in the org.apache.spark.sql namespace
  * solely to re-export the two conversions the graft expression
  * library needs (the extension-library pattern — no Spark internals
  * are modified).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows went
    * private[sql] in Spark 4) — needed to hand custom logical nodes
    * (graft.plans.TopKPerKey) back to the public Dataset API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session planner's full strategy list (sessionState is
    * private[sql]) — lets callers check whether a custom strategy is
    * already wired in (via extensions OR experimental) before
    * appending another copy.
    */
  def plannerStrategies(
      spark: org.apache.spark.sql.SparkSession): Seq[Any] =
    spark.sessionState.planner.strategies

  /** Strategies a SparkSessionExtensions instance would inject at
    * session build (buildPlannerStrategies is private[sql]) — lets a
    * test assert the extension wiring without constructing a session.
    */
  def extensionStrategies(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Seq[Any] =
    ext.buildPlannerStrategies(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** Register a SQL function on a LIVE session (sessionState is
    * private[sql]; extensions otherwise bind only at session build).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
}
