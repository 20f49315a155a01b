package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * Spark 4 moved the Column API onto ColumnNode and made the conversion
  * helpers `private[sql]`; a library registering its own codegen'd
  * expressions (graft.functions.ArrayDotProduct) still needs the two
  * conversions, so this one-file shim lives in the org.apache.spark.sql
  * namespace — the standard pattern Spark extension libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
