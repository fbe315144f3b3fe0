package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** TopKPerGroup — a whole-operator extension (SURVEY §4): the
  * "top k rows per group" semantics Spark only expresses as
  * `row_number().over(window) <= k`, which sorts EVERY group in full
  * and materializes a rank just to throw both away. This operator keeps
  * a bounded heap of k rows per group — O(n log k) and O(groups·k)
  * memory instead of a per-group sort — the same reason global top-k
  * plans as TakeOrderedAndProject rather than Sort+Limit.
  *
  * Implementation shows the full custom-operator tier: a logical node,
  * a planner strategy injected via SparkSessionExtensions, and a
  * two-phase physical plan mirroring HashAggregate: a PARTIAL heap pass
  * on the map side (no distribution requirement — runs before the
  * shuffle and emits at most k rows per (group, task), which is what
  * bounds the shuffle at 100 TB), then the FINAL pass declaring
  * ClusteredDistribution on the group keys, so EnsureRequirements
  * inserts the one hash exchange between the two.
  */
case class TopKPerGroup(
    groupingExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class TopKPerGroupExec(
    groupingExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(groupingExprs)) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val grouping = groupingExprs
    val order = sortOrder
    val kk = k
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(grouping, childOutput)
      val rowOrd = RowOrdering.create(order, childOutput)
      // per group: bounded heap holding the current best k rows; the
      // heap root is the WORST retained row (reverse order) so
      // replacement is O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val reverse = rowOrd.reversed().asInstanceOf[java.util.Comparator[UnsafeRow]]
      it.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy().asInstanceOf[UnsafeRow])
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, rowOrd.asInstanceOf[java.util.Comparator[UnsafeRow]])
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Planner strategy mapping the logical node to its physical form;
  * injected by [[graft.functions.GraftExtensions]].
  */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `TopK.perGroup(df, groups, orderings, k)`. */
object TopK {
  /** orderings: (column, ascending). Ties should be broken by trailing
    * order columns for deterministic output.
    *
    * Memory contract: each task holds O(groups-seen-in-partition × k)
    * rows. For a high-cardinality grouping key (groups ≳ 10⁶ per task ×
    * wide rows) prefer the window `row_number() <= k` formulation, which
    * sort-spills instead of holding heaps — the heap operator's win is
    * the many-rows-per-group regime, not the many-groups one.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderings: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k >= 1, s"TopK.perGroup requires k >= 1, got $k")
    require(orderings.nonEmpty, "TopK.perGroup requires at least one ordering column")
    val grouping = groupCols.map(c => GraftShim.expression(df(c)))
    val order = orderings.map { case (c, asc) =>
      val e = GraftShim.expression(df(c))
      if (asc) SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(e, org.apache.spark.sql.catalyst.expressions.Descending)
    }
    GraftShim.ofRows(df.sparkSession,
      TopKPerGroup(grouping, order, k, df.queryExecution.analyzed))
  }
}
