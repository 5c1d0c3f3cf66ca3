package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ⇄ Catalyst Expression bridge for custom expressions.
  *
  * Spark 4 made the Column API backend-agnostic; the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
  * this shim lives in an `org.apache.spark.sql` subpackage — the standard
  * extension-point pattern for libraries shipping custom codegen
  * expressions without a SparkSessionExtensions registration.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native-expression SQL function on a live session (the
    * FunctionRegistry is `private[sql]`, like the converters above). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
