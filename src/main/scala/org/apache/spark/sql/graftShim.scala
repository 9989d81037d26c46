package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's sql-private Column <-> Expression
  * converters, needed to expose custom Catalyst Expressions (e.g.
  * graft.functions.Fnv1a64Expr) as user-facing Columns on Spark 4.x,
  * where `new Column(expr)` no longer exists. This is the same
  * mechanism third-party Spark extensions use; no Spark internals are
  * modified.
  */
object graftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
