package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`; exposing it from a subpackage of
  * `org.apache.spark.sql` is the standard third-party-extension
  * technique for registering custom Catalyst expressions through the
  * public Column API (no session-level function registry required, so
  * graft queries run under ANY SparkSession, including the driver's).
  */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Register a function builder into a LIVE session's registry (the
    * `withExtensions` path only applies at session build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** Table-function twin of [[registerFunction]]: register a
    * TABLE-VALUED function builder (args → LogicalPlan) into a live
    * session — the `FROM graft_table_changes(...)` surface. */
  def registerTableFunction(spark: org.apache.spark.sql.SparkSession,
                            name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                            info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                            builder: Seq[Expression] =>
                              org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(name, info, builder)
}
