package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.GraftExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** vec_mean(array<float>) → array<double>: element-wise mean of float
  * vectors — the k-means centroid update (the refinement step for the
  * IVF coarse quantizer, pipeline/Ann.s03AnnIvf).
  *
  * A TypedImperativeAggregate with a primitive double[] buffer
  * ([count, sum_0..sum_{d-1}]): updates are allocation-free adds,
  * merges are vector adds, and the buffer serializes to 8(d+1) bytes —
  * so the shuffle carries one small buffer per (group, task) regardless
  * of row count, exactly like the builtin sketch aggregates. (The
  * declarative alternative — posexplode + groupBy(pos) + avg +
  * re-collect — shuffles dim× the input rows.)
  */
case class VecMeanAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with GraftExpectsInputTypes {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_mean"
  // Reject/coerce wrong-typed input at analysis time (arr.getFloat on a
  // non-float array would otherwise misread bytes executor-side).
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) { buf(i + 1) += arr.getFloat(i); i += 1 }
      buf(0) += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(0)
    if (n == 0) null
    else new GenericArrayData(Array.tabulate(dim)(i => buf(i + 1) / n))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object VecMeanAgg {
  /** Column API: `vec_mean(col, dim)` as an aggregate expression. */
  def vec_mean(c: Column, dim: Int): Column =
    GraftShim.column(VecMeanAgg(GraftShim.expression(c), dim).toAggregateExpression())
}
