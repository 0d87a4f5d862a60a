package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversions for the
  * custom Catalyst expressions under `graft.functions`. Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access
  * qualifier; contains no Spark-internal logic of its own.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
