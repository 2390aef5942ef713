package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The Column ↔ Expression bridge.
  *
  * Up to Spark 3.5 this was public API (`new Column(expr)` /
  * `column.expr`); Spark 4 moved it behind `private[sql]`
  * (`classic.ExpressionUtils`) as part of the Connect-compatible
  * Column refactor. A library that injects custom Catalyst
  * expressions still needs exactly this bridge to offer a PURE Column
  * API — the alternative (`call_function` on a registered name)
  * drags a thread-local `SparkSession.active` dependency into Column
  * construction and silently misbehaves in multi-session drivers
  * where the building and analyzing sessions differ.
  *
  * This object lives in a fresh `org.apache.spark.sql.*` subpackage
  * solely to satisfy the `private[sql]` qualifier; it contains no
  * Spark internals of its own and forwards 1:1 to the supported
  * implementation.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a Column (pre-4.0 `new Column(e)`). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (pre-4.0 `col.expr`). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
