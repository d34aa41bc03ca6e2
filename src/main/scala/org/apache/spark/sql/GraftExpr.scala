package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 scopes the Expression↔Column converters
  * private[sql]; this shim lives in the sql package to reach them — the
  * same pattern community Spark libraries use. No Spark internals are
  * modified. */
object GraftExpr {
  def col(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register an expression builder on an EXISTING session's function
    * registry (SparkSessionExtensions only bind at session build time). */
  def registerFunction(spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)
}
