package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo => CEqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** UPDATE and MERGE INTO as TEXT — the remaining statements of the
  * reference's `execute` surface (Stream.hs:122-145), completing
  * INSERT/DELETE (GraftCatalog/GraftLakeTable) so every DML verb a
  * pgstream caller writes runs against the lake as SQL. The
  * architecture is Delta's (public design: DeltaAnalysis rewrites
  * UpdateTable/MergeIntoTable on Delta targets into its own runnable
  * commands): a post-hoc resolution rule converts the resolved logical
  * command into a LeafRunnableCommand over the existing verb —
  * [[SnapshotsDmlOps.updateWhere]] / [[SnapshotsDmlOps.mergeInto]] —
  * so SQL text and the Scala API share ONE enforcement and pruning
  * path (stats-bounded partial rewrites, CHECK/generated/appendOnly
  * gates, manifest atomicity).
  *
  * Translatability contract (refusals are loud and name the verb):
  *  - UPDATE's WHERE must be conjunctive inclusive ranges (=, >=, <=,
  *    BETWEEN, AND — the deleteWhere model); absent WHERE = the whole
  *    table. SET targets top-level columns; values may be any
  *    expression over the row.
  *  - MERGE must be the canonical UPSERT: equi-join ON, exactly one
  *    unconditional WHEN MATCHED UPDATE and one unconditional WHEN NOT
  *    MATCHED INSERT assigning the SAME source expressions (key
  *    columns may keep the target side — equal under the join), no
  *    NOT-MATCHED-BY-SOURCE arms. Everything else → the Scala verbs.
  */
case class GraftDmlCommands(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTable(p: LogicalPlan): Option[GraftLakeTable] =
    p.collectFirst { case DataSourceV2Relation(t: GraftLakeTable, _, _, _, _, _) => t }

  /** Resolved → unresolved column refs: the command re-resolves the
    * expression against the verb's OWN read of the table (a different
    * plan instance — carried exprIds would never resolve there).
    */
  private def unresolve(e: Expression): Expression = e.transform {
    case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name)
  }

  private def toRanges(t: GraftLakeTable, cond: Option[Expression],
                       what: String): Seq[FileStats.ColRange] = cond match {
    case None => Seq(FileStats.ColRange(t.schema().fieldNames.head, None, None))
    case Some(c) =>
      // BETWEEN (and other sugar) parses as a RuntimeReplaceable the
      // filter translator does not unwrap — expand to the primitive
      // comparisons first
      val expanded = c.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
          r.replacement
      }.transformUp {
        // replacements arrive as `With` common-subexpression nodes
        // (BETWEEN shares its input) — inline the refs for translation
        case w: org.apache.spark.sql.catalyst.expressions.With =>
          val defs = w.defs.map(d => d.id -> d.child).toMap
          w.child.transformUp {
            case ref: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
              defs(ref.id)
          }
      }.transformUp {
        // BETWEEN's replacement wraps literals in casts the filter
        // translator refuses — fold constant subtrees to plain literals
        case e if e.foldable && !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] =>
          org.apache.spark.sql.catalyst.expressions.Literal.create(e.eval(), e.dataType)
      }
      org.apache.spark.sql.GraftShim.translateFilter(expanded)
        .flatMap(f => GraftLakeTable.filterRanges(f))
        .map { rs =>
          if (rs.nonEmpty) rs
          else Seq(FileStats.ColRange(t.schema().fieldNames.head, None, None))
        }
        .getOrElse(throw new UnsupportedOperationException(
          s"$what predicate not expressible as conjunctive inclusive ranges " +
            s"(=, >=, <=, BETWEEN, AND): $c — use the Snapshots verbs directly"))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u: UpdateTable if u.resolved && graftTable(u.table).isDefined =>
      val t = graftTable(u.table).get
      val ranges = toRanges(t, u.condition, "UPDATE")
      val sets = u.assignments.map { a: Assignment =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE of a nested field is not supported: $other")
        }
        name -> org.apache.spark.sql.GraftShim.column(unresolve(a.value))
      }.toMap
      GraftUpdateCommand(t.root, t.tableName, ranges, sets,
        ranges.map(_.col).distinct)

    case m: MergeIntoTable if m.resolved && graftTable(m.targetTable).isDefined =>
      val t = graftTable(m.targetTable).get
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"MERGE INTO as SQL supports only the canonical upsert " +
          s"(one unconditional WHEN MATCHED UPDATE + one unconditional WHEN NOT " +
          s"MATCHED INSERT over an equi-join) — $why; use Snapshots.mergeInto/applyChanges")
      if (m.notMatchedBySourceActions.nonEmpty) refuse("NOT MATCHED BY SOURCE arms present")
      val (upd, ins) = (m.matchedActions, m.notMatchedActions) match {
        case (Seq(ua: UpdateAction), Seq(ia: InsertAction))
            if ua.condition.isEmpty && ia.condition.isEmpty => (ua, ia)
        case _ => refuse("other/conditional action shapes")
      }
      val tgtOut = m.targetTable.outputSet
      def asgn(as: Seq[Assignment], what: String): Map[String, Expression] =
        as.map { a =>
          a.key match {
            case ar: AttributeReference => ar.name -> a.value
            case other => refuse(s"$what assigns a nested field: $other")
          }
        }.toMap
      val insSet = asgn(ins.assignments, "INSERT")
      val updSet = asgn(upd.assignments, "UPDATE")
      val cols = t.schema().fieldNames.toSeq
      if (insSet.keySet != cols.toSet) refuse("INSERT does not assign every column")
      // equi-join keys: AND of target.col = <source expr>
      def keyPairs(e: Expression): Seq[(String, Expression)] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => keyPairs(l) ++ keyPairs(r)
        case CEqualTo(a: AttributeReference, b) if tgtOut.contains(a) &&
            b.references.intersect(tgtOut).isEmpty => Seq(a.name -> b)
        case CEqualTo(b, a: AttributeReference) if tgtOut.contains(a) &&
            b.references.intersect(tgtOut).isEmpty => Seq(a.name -> b)
        case other => refuse(s"ON clause is not a target-source equi-join: $other")
      }
      val keys = keyPairs(m.mergeCondition)
      if (keys.isEmpty) refuse("no join keys")
      val keyCols = keys.map(_._1)
      // the upsert invariant: matched rows take the same source values
      // the insert arm writes (key columns may keep the target side —
      // equal by the join condition)
      cols.filterNot(keyCols.contains).foreach { c =>
        val uv = updSet.getOrElse(c, refuse(s"UPDATE does not assign column '$c'"))
        if (!uv.semanticEquals(insSet(c)))
          refuse(s"UPDATE and INSERT assign different values to '$c'")
      }
      // source row in target-column order, built on the SOURCE plan
      // (same instance → its resolved attrs stay valid)
      val srcDf = org.apache.spark.sql.GraftShim.ofRows(spark, m.sourceTable)
        .select(cols.map(c =>
          org.apache.spark.sql.GraftShim.column(insSet(c)).as(c)): _*)
      GraftMergeCommand(t.root, t.tableName, srcDf, keyCols,
        keyCols)
  }
}

/** `UPDATE graft.db.t SET … WHERE …` executed through
  * [[SnapshotsDmlOps.updateWhere]] — stats-pruned partial rewrite, one
  * published version.
  */
case class GraftUpdateCommand(root: String, table: String,
                              ranges: Seq[FileStats.ColRange],
                              sets: Map[String, org.apache.spark.sql.Column],
                              statsCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new Snapshots(session, root).updateWhere(table, ranges, sets,
      statsCols.filter(_.nonEmpty))
    Seq.empty
  }
}

/** `MERGE INTO graft.db.t USING … ON … WHEN …` (upsert form) executed
  * through [[SnapshotsDmlOps.mergeInto]] — leading-key-span pruning,
  * one full-outer join over the touched files, one published version.
  */
case class GraftMergeCommand(root: String, table: String,
                             source: org.apache.spark.sql.DataFrame,
                             keyCols: Seq[String], statsCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new Snapshots(session, root).mergeInto(table, source, keyCols, statsCols)
    Seq.empty
  }
}
