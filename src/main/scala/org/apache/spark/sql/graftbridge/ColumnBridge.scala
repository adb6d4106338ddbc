package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (columnNodeSupport.scala); custom Catalyst expressions still need it
  * to expose a Column API. This shim lives under `org.apache.spark.sql`
  * purely for access — the standard pattern for Spark extension libs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Strip a sort-direction wrapper (`.desc`, `.asc_nulls_last`, …)
    * down to the ordered VALUE, if present. Spark 4 keeps the
    * direction as a `private[sql]` ColumnNode, so callers that accept
    * user order columns but also need the key inside a projection
    * (where SortOrder is an analysis error) route through here. */
  def stripSortOrder(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => new Column(so.child)
    case _ => c
  }
}
