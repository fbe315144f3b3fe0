package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4.x
  * moved Column onto ColumnNode; classic.ExpressionUtils is the sanctioned
  * internal conversion). Lives in the org.apache.spark.sql package purely
  * for access; graft code calls it via graft.functions.functions.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (classic Dataset.ofRows). */
  def ofRows(s: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
