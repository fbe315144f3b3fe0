package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{AlterTableCommand, DeleteFromTable, HintInfo, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, ResolvedHint, SHUFFLE_HASH, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis rule: every READ of a [[GraftLakeTable]] relation becomes
  * the engine's own v1 manifest-planned scan (the Delta-connector
  * architecture, public design — DeltaAnalysis rewrites DeltaTableV2
  * relations to the v1 HadoopFsRelation for exactly this reason): one
  * read path, full FileSourceStrategy pushdown/pruning/vectorization,
  * deletion vectors and column mapping applied, zero directory
  * listings ([[org.apache.spark.sql.GraftLakeShim.parquetByManifest]]).
  * The relation's attributes are re-bound onto the converted plan by
  * exprId, so parents resolve unchanged.
  *
  * Write targets are untouched: `V2WriteCommand.table` is a FIELD (not
  * a plan child) so tree transforms never reach it, and the pre-
  * resolution `InsertIntoStatement.table` child is explicitly skipped.
  *
  * STATS-DRIVEN JOIN STRATEGY (the lake-side CBO move): the manifest
  * already records every file's exact length, so the converted scan
  * carries a true sizeInBytes and Spark auto-BROADCASTS a small lake
  * table with no user hint. Past the broadcast threshold, the rule
  * attaches a SHUFFLE_HASH hint iff the table's per-partition build
  * share (recorded bytes / shuffle partitions) still fits the same
  * budget a broadcast would (≤ autoBroadcastJoinThreshold) — hash
  * beats sort-merge when the build side fits memory, and the manifest
  * KNOWS it fits; a bigger table falls through to sort-merge. The hint
  * never fires below the broadcast threshold (a SHJ hint outranks
  * unhinted size-based broadcast in JoinSelection and would defeat
  * it).
  */
case class GraftLakeReads(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a relation standing as a WRITE/DML target must keep its DSv2
    // form (the executor needs the Table's write/delete capabilities):
    // InsertIntoStatement.table and the row-level commands' targets
    // are plan CHILDREN, so the transform would otherwise reach them
    // (the resolved V2WriteCommand keeps its table out of the tree)
    def rels(p: LogicalPlan): Seq[LogicalPlan] =
      p.collect { case r: DataSourceV2Relation => r } // target may sit under an alias
    val writeTargets: Set[LogicalPlan] = plan.collect {
      case i: InsertIntoStatement => rels(i.table)
      case w: V2WriteCommand => rels(w.table)
      case d: DeleteFromTable => rels(d.table)
      case u: UpdateTable => rels(u.table)
      case m: MergeIntoTable => rels(m.targetTable)
      // ALTER commands (incl. Spark 4's ADD/DROP CONSTRAINT) resolve
      // their target as a plan CHILD; rewriting it to the v1 relation
      // would make ResolveSessionCatalog misread the statement as a
      // session-catalog (v1) ALTER — keep the DSv2 form so the change
      // lowers to TableChange and the catalog's alterTable
      case a: AlterTableCommand => rels(a.child)
      // ADD CONSTRAINT CHECK resolves through AddCheckConstraint, whose
      // child is the table READ Spark uses to type-check the predicate;
      // rewriting it trips ResolveSessionCatalog's v1-table sniff
      // (LogicalRelation.catalogTable.get on our catalog-less relation)
      case c: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        rels(c.child)
    }.flatten.toSet
    plan.resolveOperators {
      case DataSourceV2Relation(t: GraftMetaTable, output, _, _, _, _) =>
        // metadata tables ($history/$files/$detail/$properties): the
        // manifest-derived DataFrame, attrs re-bound — zero data IO
        val read = GraftMetaTables.df(spark, t.root, t.baseTable, t.kind,
          t.pinnedVersion).queryExecution.analyzed
        Project(output.zip(read.output).map { case (out, in) =>
          Alias(in, out.name)(exprId = out.exprId)
        }, read)
      case DataSourceV2Relation(t: GraftViewTable, output, _, _, _, _) =>
        // persistent views: the stored query's analyzed plan, body
        // resolved at the view's pinned version ([[GraftViews.df]] —
        // nested views expanded, table reads manifest-planned with the
        // same stats-driven join sizing)
        val read = GraftViews.df(new Snapshots(spark, t.root), t.viewName,
          Some(t.pinnedVersion)).queryExecution.analyzed
        Project(output.zip(read.output).map { case (out, in) =>
          Alias(in, out.name)(exprId = out.exprId)
        }, read)
      case r @ DataSourceV2Relation(t: GraftLakeTable, output, _, _, _, _)
          if !writeTargets.contains(r) =>
        val snap = new Snapshots(spark, t.root)
        val read = snap.read(t.tableName, Some(t.pinnedVersion))
          .queryExecution.analyzed
        // re-bind the relation's attributes (by exprId) onto the
        // converted plan's columns — names/types/order agree by
        // construction (the catalog derived schema() from this read)
        val aligned = Project(output.zip(read.output).map { case (out, in) =>
          Alias(in, out.name)(exprId = out.exprId)
        }, read)
        GraftLakeReads.maybeShuffleHash(spark, snap, t.tableName,
          t.pinnedVersion, aligned)
    }
  }
}

object GraftLakeReads {
  /** The stats-driven join-strategy decision on one converted lake
    * read (shared by the catalog read path and view expansion): past
    * the broadcast threshold, attach a SHUFFLE_HASH hint iff the
    * table's per-partition build share (manifest-recorded bytes /
    * shuffle partitions) still fits the broadcast budget — hash beats
    * sort-merge when the build side fits memory, and the manifest
    * KNOWS it fits. Never fires below the broadcast threshold (a SHJ
    * hint outranks unhinted size-based broadcast in JoinSelection).
    */
  private[sources] def maybeShuffleHash(spark: SparkSession, snap: Snapshots,
                                        table: String, version: Long,
                                        plan: LogicalPlan): LogicalPlan = {
    val threshold = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt.max(1)
    val bytes = try snap.tableBytes(table, Some(version))
      catch { case _: Exception => Long.MaxValue }
    if (threshold > 0 && bytes > threshold && bytes / parts <= threshold)
      ResolvedHint(plan, HintInfo(strategy = Some(SHUFFLE_HASH)))
    else plan
  }
}
