package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow bridge into Spark's `private[sql]` surface.
  *
  * Spark 4.x made `Column(expr)` / `ExpressionUtils` / the function
  * registry `private[sql]`; graft's native Catalyst expressions
  * ([[graft.functions.JsonIsValid]] etc.) still need Column wrapping and
  * SQL-name registration. Everything here delegates to public-jar classes
  * of Apache Spark itself — this file only exists to sit in the `sql`
  * package so the accessors resolve.
  */
object GraftBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function built from raw expressions. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
