package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column/Expression plumbing —
  * the established pattern for libraries that ship native Catalyst
  * expressions (a shim object inside the `org.apache.spark.sql`
  * namespace; the factory methods themselves are stable across the
  * 4.x classic API). Kept to the three calls the engine needs, so
  * the private-API surface stays auditable in one file.
  */
object ColumnBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly CONVERTED catalyst expression of a Column — unlike
    * [[expression]], which returns a lazy `ColumnNodeExpression`
    * wrapper around the internal column AST (fine inside a plan the
    * analyzer will visit, but not serializable and not
    * pattern-matchable as catalyst nodes). Custom operators that
    * capture expressions into task closures ([[graft.plans
    * .PerKeyTopK]]) need the converted tree.
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a native function on an existing session (the
    * `SparkSessionExtensions` route needs the session built with
    * `.withExtensions`; this is the post-hoc equivalent).
    */
  def register(spark: SparkSession,
               description: (FunctionIdentifier, ExpressionInfo,
                 Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)

  /** A DataFrame over a hand-built logical plan — what a custom
    * operator's builder ([[graft.plans.PerKeyTopK]]) returns. The
    * `Dataset.ofRows` factory is the same call every DataFrame API
    * method bottoms out in.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
