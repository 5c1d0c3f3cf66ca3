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
}
