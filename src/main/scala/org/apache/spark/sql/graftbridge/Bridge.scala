package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4.x made this interop
  * package-private (`org.apache.spark.sql.classic.ExpressionUtils`), so the
  * engine exposes it from inside the org.apache.spark.sql namespace — the
  * standard pattern for libraries shipping custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
