package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** ShinglePairs — the posting-list pair generator of the set-similarity
  * dedup family (d04/d14/d07 candidates) as a whole-operator extension.
  *
  * Input: (key, id) posting rows. Output: every i<j id pair within a
  * key whose TRUE document frequency is ≤ cap — the df-capped candidate
  * relation. The operator declares ClusteredDistribution(key) plus
  * ascending key ordering, so EnsureRequirements plans exactly ONE hash
  * exchange and a radix sort of 16-byte rows; groups are then
  * consecutive and pair emission is a linear scan with one bounded
  * long-array buffer — no hash map of group buffers, no per-group
  * object serialization, no posting-table self-join. (The r11 shape —
  * df groupBy + posting⋈rare + posting self-join — exchanged
  * postings-scale data five times and computed the subtree twice; the
  * r12 ObjectHashAggregate form was one exchange but paid object
  * buffers + per-group serialize; this operator is one exchange, one
  * radix sort, zero allocation per group beyond the reused buffer.)
  *
  * Scale guard: a group past `cap` (corpus-wide boilerplate shingle)
  * buffers nothing beyond cap+1 longs and emits nothing — memory per
  * task is O(cap), never O(df); the emitted pair count is
  * Σ_{df≤cap} C(df,2) ≤ cap·|postings|/2, linear in the corpus.
  */
case class ShinglePairs(
    keyExpr: Expression,
    idExpr: Expression,
    cap: Int,
    child: LogicalPlan,
    aAttr: Attribute,
    bAttr: Attribute) extends UnaryNode {
  override def output: Seq[Attribute] = Seq(aAttr, bAttr)
  override def producedAttributes: AttributeSet = AttributeSet(Seq(aAttr, bAttr))
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class ShinglePairsExec(
    keyExpr: Expression,
    idExpr: Expression,
    cap: Int,
    aAttr: Attribute,
    bAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = Seq(aAttr, bAttr)
  override def producedAttributes: AttributeSet = AttributeSet(Seq(aAttr, bAttr))
  // The child is hash-partitioned on the KEY expression, which is not in
  // this node's output (a_id, b_id) — passing it through would advertise a
  // partitioning over a dropped attribute and could let a downstream
  // exchange be wrongly elided. Only the partition COUNT survives.
  override def outputPartitioning: Partitioning =
    UnknownPartitioning(child.outputPartitioning.numPartitions)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExpr :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(keyExpr, Ascending) :: Nil)
  override def nodeName: String = "ShinglePairs"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kExpr = keyExpr
    val iExpr = idExpr
    val capN = cap
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(kExpr :: Nil, childOutput)
      val idProj = UnsafeProjection.create(iExpr :: Nil, childOutput)
      val toUnsafe = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](LongType, LongType))
      val outRow = new GenericInternalRow(2)
      new Iterator[InternalRow] {
        // current group: key + first min(n, cap+1) ids (an overflowed
        // group keeps counting but stores nothing more). Grown on
        // demand, never preallocated at cap (callers may pass an
        // effectively-uncapped maxDf).
        private var buf = new Array[Long](16)
        private var curKey = 0L
        private var haveKey = false
        private var n = 0
        // closed group being emitted (separate array: `buf` already
        // holds the NEXT group's first id by the time pairs drain)
        private var emit = new Array[Long](16)
        private var nEmit = 0
        private var emitA = 0
        private var emitB = 1
        private var done = false

        /** Close the current group into the emit buffer; true if it has pairs. */
        private def closeGroup(): Boolean = {
          if (n >= 2 && n <= capN) {
            if (emit.length < n) emit = new Array[Long](n)
            System.arraycopy(buf, 0, emit, 0, n)
            java.util.Arrays.sort(emit, 0, n)
            nEmit = n; emitA = 0; emitB = 1
            true
          } else false
        }

        /** Scan input until a group with pairs is closed; false at end. */
        private def advance(): Boolean = {
          if (done) return false
          while (it.hasNext) {
            val row = it.next()
            val k = keyProj(row).getLong(0)
            val id = idProj(row).getLong(0)
            if (!haveKey) {
              haveKey = true; curKey = k; buf(0) = id; n = 1
            } else if (k == curKey) {
              if (n <= capN) { // one slot of slack; overflow detected by count
                if (n == buf.length)
                  buf = java.util.Arrays.copyOf(buf, math.max(32, buf.length * 2))
                buf(n) = id
              }
              n += 1
            } else {
              val had = closeGroup()
              curKey = k; buf(0) = id; n = 1
              if (had) return true
            }
          }
          done = true
          haveKey && closeGroup()
        }

        override def hasNext: Boolean = nEmit > 0 || advance()

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          outRow.setLong(0, emit(emitA))
          outRow.setLong(1, emit(emitB))
          emitB += 1
          if (emitB >= nEmit) { emitA += 1; emitB = emitA + 1 }
          if (emitA >= nEmit - 1) nEmit = 0 // group drained
          toUnsafe(outRow)
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object ShinglePairsStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ShinglePairs(k, i, cap, child, a, b) =>
      ShinglePairsExec(k, i, cap, a, b, planLater(child)) :: Nil
    case _ => Nil
  }
}

object ShinglePairs {
  /** `pairs(df, keyCol, idCol, cap)` → DataFrame(a_id, b_id): all i<j
    * id pairs within each key whose group size is ≤ cap. Both columns
    * must be BIGINT.
    */
  def pairs(df: DataFrame, keyCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"ShinglePairs requires cap >= 1, got $cap")
    // the operator reads both columns via UnsafeRow.getLong — a non-long
    // column would be silently misread into garbage pairs
    require(df.schema(keyCol).dataType == LongType,
      s"ShinglePairs key column '$keyCol' must be BIGINT, got ${df.schema(keyCol).dataType.sql}")
    require(df.schema(idCol).dataType == LongType,
      s"ShinglePairs id column '$idCol' must be BIGINT, got ${df.schema(idCol).dataType.sql}")
    val a = AttributeReference("a_id", LongType, nullable = false)()
    val b = AttributeReference("b_id", LongType, nullable = false)()
    GraftShim.ofRows(df.sparkSession,
      ShinglePairs(GraftShim.expression(df(keyCol)), GraftShim.expression(df(idCol)),
        cap, df.queryExecution.analyzed, a, b))
  }
}
