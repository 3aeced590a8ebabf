package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column ⇄ Expression conversions for the
  * engine's native Catalyst expressions (the supported pattern for
  * third-party expression libraries on Spark 4's column-node API).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression on an ALREADY-BUILT session (the
    * extensions path only runs at session construction).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      e => builder(e))
}
