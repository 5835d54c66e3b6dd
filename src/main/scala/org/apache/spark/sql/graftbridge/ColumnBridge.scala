package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column <-> catalyst Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom native
  * expressions still need it, so this shim re-exports the two calls from
  * inside the sql package tree — the standard pattern for Spark 4
  * extension libraries that ship codegen expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A one-row one-column DataFrame as a scalar-subquery Column — the
    * form expressions like `might_contain` require their sketch input
    * in (the same way InjectRuntimeFilter plumbs its bloom build side).
    * Identical subquery instances are deduplicated by ReuseSubquery. */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))
}
