package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.LongType
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
    child: LogicalPlan,
    maxGroupsPerFlush: Int = TopKPerGroup.DefaultMaxGroupsPerFlush,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  // rankAttr is held in the node (created once at the API), not minted in
  // `output`: a fresh AttributeReference per call would change exprId on
  // every tree copy and orphan parent references to the rank column.
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // rank originates HERE, not in the child — without this the analyzer
  // reports it as a missing input attribute
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKPerGroup {
  /** Map-side flush threshold: caps partial-phase memory at
    * O(threshold · k) rows regardless of grouping cardinality.
    */
  val DefaultMaxGroupsPerFlush: Int = 1 << 20
}

case class TopKPerGroupExec(
    groupingExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxGroupsPerFlush: Int,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
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
    val isPartial = partial
    val flushAt = maxGroupsPerFlush
    val emitRank = rankAttr.isDefined
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(grouping, childOutput)
      val rowOrd = RowOrdering.create(order, childOutput)
      val reverse = rowOrd.reversed().asInstanceOf[java.util.Comparator[UnsafeRow]]
      // rank emission (final phase only): the per-group drain is already
      // sorted, so rank IS the drain position — appended via a reused
      // JoinedRow + unsafe projection, replacing the Sort+Window+filter
      // tail callers previously ran over the operator's bounded output.
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val toUnsafe =
        if (emitRank) UnsafeProjection.create((childOutput.map(_.dataType) :+ LongType).toArray)
        else null

      // per group: bounded heap holding the current best k rows; the
      // heap root is the WORST retained row (reverse order) so
      // replacement is O(log k).
      //
      // Memory guard (partial phase only): when the map reaches
      // maxGroupsPerFlush distinct groups, drain it and start a new
      // chunk. Early emission is CORRECT for the partial phase — like
      // a partial hash aggregate falling back to pass-through, the
      // final phase re-merges per-chunk winners — so map-side memory
      // is hard-bounded at O(maxGroupsPerFlush · k) rows no matter
      // the grouping cardinality. The final phase sees only the
      // groups hashed to its task (groups/numPartitions — sized by
      // shuffle partitioning) and must not flush early (it would emit
      // duplicate per-group results).
      new Iterator[InternalRow] {
        private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        private var out: Iterator[InternalRow] = Iterator.empty

        private def drain(): Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          val all = heaps.values().asScala.toArray
          heaps.clear()
          all.iterator.flatMap { h =>
            val arr = h.toArray(new Array[UnsafeRow](h.size))
            java.util.Arrays.sort(arr, rowOrd.asInstanceOf[java.util.Comparator[UnsafeRow]])
            if (!emitRank) arr.iterator
            else arr.iterator.zipWithIndex.map { case (r, i) =>
              rankRow.setLong(0, i + 1L)
              toUnsafe(joined(r, rankRow))
            }
          }
        }

        private def fill(): Unit = {
          while (it.hasNext && !(isPartial && heaps.size >= flushAt)) {
            val row = it.next()
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
          out = drain()
        }

        override def hasNext: Boolean =
          out.hasNext || ((it.hasNext || !heaps.isEmpty) && { fill(); out.hasNext })
        override def next(): InternalRow = { if (!hasNext) throw new NoSuchElementException; out.next() }
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
    case TopKPerGroup(g, o, k, child, flush, rank) =>
      // rank only on the FINAL phase: partial drains are per-chunk/per-task
      // and their positions are not global ranks.
      TopKPerGroupExec(g, o, k, partial = false, flush,
        TopKPerGroupExec(g, o, k, partial = true, flush, planLater(child)),
        rankAttr = rank) :: Nil
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
  /** With `rankCol` set, the operator itself appends the 1-based
    * within-group rank (BIGINT) from its sorted drain — callers needing
    * (row, rank) pairs avoid re-deriving rank with a Window over the
    * operator's output.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderings: Seq[(String, Boolean)], k: Int,
               maxGroupsPerFlush: Int = TopKPerGroup.DefaultMaxGroupsPerFlush,
               rankCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"TopK.perGroup requires k >= 1, got $k")
    require(orderings.nonEmpty, "TopK.perGroup requires at least one ordering column")
    require(maxGroupsPerFlush >= 1, s"maxGroupsPerFlush must be >= 1, got $maxGroupsPerFlush")
    val grouping = groupCols.map(c => GraftShim.expression(df(c)))
    val order = orderings.map { case (c, asc) =>
      val e = GraftShim.expression(df(c))
      if (asc) SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(e, org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val rank = rankCol.map(n => AttributeReference(n, LongType, nullable = false)())
    GraftShim.ofRows(df.sparkSession,
      TopKPerGroup(grouping, order, k, df.queryExecution.analyzed, maxGroupsPerFlush, rank))
  }
}
