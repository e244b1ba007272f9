package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ Expression bridge (`ExpressionUtils`)
  * `private[sql]`; libraries adding native expressions reach it from a
  * subpackage of `org.apache.spark.sql` — the conventional shim, no
  * internals copied. */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
