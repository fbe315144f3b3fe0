package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpectsInputTypes
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** weighted_avg(value, weight) → double: Σ(v·w) / Σw.
  *
  * The DECLARATIVE custom-aggregate tier (complementing the
  * TypedImperativeAggregate tier shown by [[VecMeanAgg]]): the buffer
  * is two unboxed double slots living INSIDE the hash-aggregate's
  * UnsafeRow, and init/update/merge/evaluate are pure Catalyst
  * expressions — so the whole aggregate compiles into whole-stage
  * codegen with map-side partial aggregation and zero
  * serialization, exactly like the builtin `avg`. This is the
  * preferred shape for any custom aggregate whose state is a fixed
  * tuple of scalars; reach for TypedImperativeAggregate only when the
  * state is a real object (sketch, vector, heap).
  */
case class WeightedAvg(value: Expression, weight: Expression)
    extends DeclarativeAggregate with GraftExpectsInputTypes {

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weighted_avg"
  override def graftInputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  private lazy val vwSum = AttributeReference("vw_sum", DoubleType, nullable = false)()
  private lazy val wSum = AttributeReference("w_sum", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(vwSum, wSum)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = value.isNotNull && weight.isNotNull
    Seq(
      If(valid, vwSum + value * weight, vwSum),
      If(valid, wSum + weight, wSum))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    vwSum.left + vwSum.right,
    wSum.left + wSum.right)

  override lazy val evaluateExpression: Expression =
    If(wSum === Literal(0.0), Literal(null, DoubleType), vwSum / wSum)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0), weight = c(1))
}

object WeightedAvg {
  /** Column API: `weighted_avg(value, weight)` as an aggregate. */
  def weighted_avg(value: Column, weight: Column): Column =
    GraftShim.column(
      WeightedAvg(GraftShim.expression(value), GraftShim.expression(weight))
        .toAggregateExpression())
}
