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

/** Input-type declaration bridge. `AbstractDataType` (and therefore the
  * `inputTypes` override signature of `ImplicitCastInputTypes`) is
  * private[sql] in Spark 4.1, so the override must be written inside this
  * package; graft expressions implement the public `graftInputTypes`
  * with concrete [[org.apache.spark.sql.types.DataType]]s instead and get
  * analysis-time coercion/rejection (Catalyst inserts casts for e.g.
  * array<double> → array<float>, or fails analysis on non-arrays) rather
  * than executor-side byte-misreads.
  */
trait GraftExpectsInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = graftInputTypes
}
