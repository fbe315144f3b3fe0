package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo => CEqualTo, Exists, Expression, In => CIn, InSubquery, ListQuery, Literal, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** DELETE, UPDATE and MERGE INTO as TEXT — the statement surface of the
  * reference's `execute` (Stream.hs:122-145), so every DML verb a
  * pgstream caller writes runs against the lake as SQL. The
  * architecture is Delta's (public design: DeltaAnalysis rewrites
  * row-level commands on Delta targets into its own runnable commands):
  * a post-hoc resolution rule converts the resolved logical command
  * into a LeafRunnableCommand over the existing verb —
  * [[SnapshotsDmlOps.deleteWhere]] / [[SnapshotsDmlOps.updateWhere]] /
  * [[SnapshotsDmlOps.mergeInto]] / [[SnapshotsDmlOps.mergeClauses]] —
  * so SQL text and the Scala API share ONE enforcement and pruning
  * path (stats-bounded partial rewrites, CHECK/generated/appendOnly
  * gates, manifest atomicity).
  *
  * PREDICATE SPLIT (general WHERE): an arbitrary deterministic
  * predicate is split into (a) a conservative conjunctive
  * inclusive-range ENVELOPE — per conjunct, per column, a superset of
  * the matching region, used only for stats/file pruning and the
  * concurrent-writer disjointness proof — and (b) the FULL expression
  * as the exact residual the rewrite applies row-by-row. Strict </>,
  * OR, IN, !=, NOT, IS NULL and null-safe forms all execute; a
  * conjunct the envelope cannot bound simply contributes no pruning.
  * Only non-deterministic predicates and subqueries refuse (loudly,
  * naming the verb) — a subquery's value is not a row property, and a
  * non-deterministic predicate would classify files against one
  * evaluation and rewrite rows against another.
  *
  * MERGE lowers the FULL ANSI/Delta clause matrix — ordered
  * conditional WHEN MATCHED UPDATE/DELETE arms, ordered conditional
  * WHEN NOT MATCHED INSERT arms, and WHEN NOT MATCHED BY SOURCE
  * UPDATE/DELETE arms — onto [[SnapshotsDmlOps.mergeClauses]]' one
  * span-pruned full-outer rewrite. The ON clause needs at least one
  * target-source EQUALITY (the span-pruning contract); further
  * deterministic conjuncts (`AND s.ts > t.ts`) ride as a RESIDUAL
  * inside the join condition — ANSI non-match semantics (a key-equal
  * pair failing the residual is simply not matched), and matches only
  * narrow so the span stays sound. BY SOURCE arms widen the touched
  * set to the whole table (their rows lie outside any source span —
  * the engine prunes only when pruning is sound).
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

  /** UNCORRELATED subqueries in a DML predicate, materialized: the
    * production shapes `DELETE FROM t WHERE k IN (SELECT k FROM
    * gdpr_list)`, `… NOT IN (…)` (ANSI three-valued: a NULL in the
    * list, or a NULL probe, keeps the row), uncorrelated `EXISTS`
    * (a run-time boolean constant) and uncorrelated scalar subqueries
    * (`WHERE x > (SELECT avg(x) …)`). Each subquery runs ONCE here and
    * collapses to a literal — an IN list becomes Catalyst `In` over
    * literals (an InSet probe after optimization, the broadcast-side
    * equivalent of deleteKeys' anti-join with zero extra shuffle), so
    * the predicate then flows through the SAME envelope/residual split
    * as any other: the IN list's [min,max] span prunes files exactly
    * like deleteKeys' key span. Guards: the list is DISTINCT-reduced
    * and refuses past `spark.graft.dml.subqueryInMaxRows` (a keyset
    * beyond inline size is what the Scala `deleteKeys` verb is for —
    * its message says so); CORRELATED subqueries refuse loudly (their
    * value is not a row property the split can classify files by).
    */
  private val SubqueryInMaxRowsConf = "spark.graft.dml.subqueryInMaxRows"

  private def materializeSubqueries(c: Expression, what: String): Expression = {
    if (!SubqueryExpression.hasSubquery(c)) return c
    val maxRows = spark.conf.getOption(SubqueryInMaxRowsConf).map(_.toInt).getOrElse(100000)
    def refuseCorrelated(which: String): Nothing =
      throw new UnsupportedOperationException(
        s"$what with a CORRELATED $which subquery is not supported as SQL text — " +
          "a correlated value is not a row property file classification can bound; " +
          "rewrite as a join and use the Scala verbs (deleteKeys/applyChanges)")
    def run(plan: LogicalPlan) = org.apache.spark.sql.GraftShim.ofRows(spark, plan)
    c.transformUp {
      case InSubquery(values, q: ListQuery) =>
        if (q.outerAttrs.nonEmpty) refuseCorrelated("IN")
        if (values.length != 1) throw new UnsupportedOperationException(
          s"$what with a multi-column IN subquery is not supported as SQL text — " +
            "use the composite-key Scala verbs (deleteKeys/applyChanges)")
        val dt = q.plan.output.head.dataType
        // distinct() keeps ONE null if present — required for NOT IN's
        // three-valued semantics (a null in the list poisons non-matches
        // to NULL, and the verbs' !coalesce(pred, false) keeps the row)
        val rows = run(q.plan).distinct().limit(maxRows + 1).collect()
        if (rows.length > maxRows) throw new UnsupportedOperationException(
          s"$what: the IN subquery yields more than $SubqueryInMaxRowsConf=$maxRows " +
            "distinct values — too large to inline as a literal list; materialize " +
            "it and use Snapshots.deleteKeys (span-pruned broadcast anti-join)")
        if (rows.isEmpty) Literal.FalseLiteral // x IN (empty) = FALSE, ANSI
        else CIn(values.head, rows.toSeq.map(r => Literal.create(r.get(0), dt)))
      case e: Exists =>
        if (e.outerAttrs.nonEmpty) refuseCorrelated("EXISTS")
        Literal(run(e.plan).limit(1).count() > 0L)
      case s: ScalarSubquery =>
        if (s.outerAttrs.nonEmpty) refuseCorrelated("scalar")
        val rows = run(s.plan).limit(2).collect()
        require(rows.length <= 1,
          s"$what: scalar subquery returned more than one row")
        Literal.create(if (rows.isEmpty) null else rows(0).get(0), s.dataType)
    }
  }

  /** Split a resolved WHERE into (envelope ranges for pruning, exact
    * residual Column). Uncorrelated subqueries materialize first
    * ([[materializeSubqueries]]); only correlated subqueries and
    * non-determinism refuse.
    */
  private def splitPredicate(t: GraftLakeTable, cond: Option[Expression],
                             what: String): (Seq[FileStats.ColRange],
                                             org.apache.spark.sql.Column) =
    cond match {
      case None =>
        (Seq(FileStats.ColRange(t.schema().fieldNames.head, None, None)),
          org.apache.spark.sql.functions.lit(true))
      case Some(c0) =>
        val c = materializeSubqueries(c0, what)
        if (SubqueryExpression.hasSubquery(c))
          throw new UnsupportedOperationException(
            s"$what with this subquery form is not supported as SQL text — " +
              s"materialize the subquery and use the Snapshots verbs (deleteKeys/" +
              s"applyChanges): $c")
        if (!c.deterministic)
          throw new UnsupportedOperationException(
            s"$what predicate must be deterministic (file classification and the " +
              s"row rewrite must agree): $c")
        // expand BETWEEN-style RuntimeReplaceables and inline their
        // `With` CSE refs BEFORE unresolving: the residual re-resolves
        // against the verb's own read, and a CommonExpressionDef with
        // unresolved children breaks that re-resolution
        val expanded = PredicateEnvelope.expand(c)
        val env = PredicateEnvelope.of(expanded)
        val ranges =
          if (env.nonEmpty) env
          else Seq(FileStats.ColRange(t.schema().fieldNames.head, None, None))
        (ranges, org.apache.spark.sql.GraftShim.column(unresolve(expanded)))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // `ALTER TABLE … ADD CONSTRAINT nm CHECK (expr)` — Spark resolves
    // it as AddCheckConstraint(tableRead, CheckConstraint) and would
    // otherwise plan its OWN validation scan over the DSv2 relation;
    // the engine's addCheck already validates existing rows in one
    // O(table) pass and publishes the `@check` line atomically, so the
    // statement lowers to that verb whole (cc.condition is the user's
    // predicate text; the verb re-parses and re-binds it on every
    // write, same as a Scala-declared check)
    case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint
        if graftTable(a.child).isDefined =>
      val t = graftTable(a.child).get
      GraftAddCheckCommand(t.root, t.tableName,
        a.checkConstraint.name, a.checkConstraint.condition)

    case d: DeleteFromTable if d.resolved && graftTable(d.table).isDefined =>
      val t = graftTable(d.table).get
      val cond = Option(d.condition).filterNot(_ ==
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
      val (ranges, pred) = splitPredicate(t, cond, "DELETE")
      GraftDeleteCommand(t.root, t.tableName, ranges, pred,
        ranges.map(_.col).distinct.filter(_ != null))

    case u: UpdateTable if u.resolved && graftTable(u.table).isDefined =>
      val t = graftTable(u.table).get
      val (ranges, pred) = splitPredicate(t, u.condition, "UPDATE")
      val sets = u.assignments.map { a: Assignment =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE of a nested field is not supported: $other")
        }
        // SET values may carry uncorrelated scalar subqueries too
        // (`SET v = (SELECT max(v) FROM …)`) — same materialize-once,
        // pre-statement-snapshot semantics as the WHERE
        name -> org.apache.spark.sql.GraftShim.column(
          unresolve(materializeSubqueries(a.value, "UPDATE SET")))
      }.toMap
      GraftUpdateCommand(t.root, t.tableName, ranges, pred, sets,
        ranges.map(_.col).distinct.filter(_ != null))

    case m: MergeIntoTable if m.resolved && graftTable(m.targetTable).isDefined =>
      val t = graftTable(m.targetTable).get
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"MERGE INTO as SQL: $why — use Snapshots.mergeInto/mergeClauses/applyChanges")
      // WITH SCHEMA EVOLUTION needs no handling HERE: the table
      // declares AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer's
      // ResolveMergeIntoSchemaEvolution already diffed the schemas,
      // drove GraftCatalog.alterTable (additive columns + lossless
      // widenings, refusals inside the verbs) and re-resolved the
      // target — by this post-hoc rule the evolution is published and
      // `t.schema()` is the wide schema.
      val tgtOut = m.targetTable.outputSet
      val srcOut = m.sourceTable.outputSet
      val cols = t.schema().fieldNames.toSeq

      // rewrite a clause expression onto the verb's joined frame:
      // target attrs keep their names, source attrs land under the
      // reserved `_mrg_src_` prefix the verb exposes them as
      def onJoined(e: Expression): org.apache.spark.sql.Column =
        org.apache.spark.sql.GraftShim.column(e.transform {
          case ar: AttributeReference if srcOut.contains(ar) =>
            UnresolvedAttribute.quoted(Snapshots.SrcPrefix + ar.name)
          case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name)
        })
      def asgn(as: Seq[Assignment], what: String): Map[String, org.apache.spark.sql.Column] =
        as.map { a =>
          a.key match {
            case ar: AttributeReference => ar.name -> onJoined(a.value)
            case other => refuse(s"$what assigns a nested field: $other")
          }
        }.toMap

      // ON clause split: target-source EQUALITY conjuncts become the
      // join keys (span pruning classifies files by the source key
      // span); every OTHER deterministic conjunct rides as a RESIDUAL
      // inside the join condition — ANSI: a key-equal pair failing it
      // is simply not matched (target row → BY SOURCE side, source row
      // → INSERT side). At least one equality must remain, or no span
      // bounds the touched set.
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      def asKeyPair(e: Expression): Option[(String, Expression)] = e match {
        case CEqualTo(a: AttributeReference, b) if tgtOut.contains(a) &&
            b.references.intersect(tgtOut).isEmpty => Some(a.name -> b)
        case CEqualTo(b, a: AttributeReference) if tgtOut.contains(a) &&
            b.references.intersect(tgtOut).isEmpty => Some(a.name -> b)
        case _ => None
      }
      val onParts = conjuncts(m.mergeCondition).map(e => (e, asKeyPair(e)))
      val keys0 = onParts.flatMap(_._2)
      if (keys0.isEmpty) refuse("the ON clause carries no target-source equality " +
        "(span pruning classifies files by the source key span)")
      val residuals = onParts.collect { case (e, None) => e }
      residuals.foreach { e =>
        if (SubqueryExpression.hasSubquery(e) || !e.deterministic)
          refuse(s"a residual ON conjunct must be deterministic and subquery-free: $e")
      }
      val residualOn = residuals.reduceOption(
        org.apache.spark.sql.catalyst.expressions.And(_, _)).map(onJoined)
      // ON equating one target column twice: keep a single projection
      // per target column when the source expressions are semantically
      // equal (ON t.k = s.k AND t.k = s.k), refuse loudly when they
      // differ (t.k = s.a AND t.k = s.b would otherwise project two
      // columns named k and die downstream as an ambiguous attribute)
      val keys = keys0.groupBy(_._1).toSeq.sortBy(p => keys0.indexWhere(_._1 == p._1))
        .map { case (k, pairs) =>
          val exprs = pairs.map(_._2)
          if (!exprs.tail.forall(_.semanticEquals(exprs.head)))
            refuse(s"the ON clause equates target column '$k' to two different " +
              s"source expressions (${exprs.mkString(" vs ")})")
          k -> exprs.head
        }
      val keyCols = keys.map(_._1)
      keyCols.foreach(k => require(cols.contains(k),
        s"merge key '$k' is not a column of table '${t.tableName}'"))

      val matched: Seq[Snapshots.WhenMatched] = m.matchedActions.map {
        case ua: UpdateAction =>
          Snapshots.MatchedUpdate(ua.condition.map(onJoined), asgn(ua.assignments, "UPDATE"))
        case da: DeleteAction =>
          Snapshots.MatchedDelete(da.condition.map(onJoined))
        case other => refuse(s"unsupported WHEN MATCHED action: $other")
      }
      val notMatched: Seq[Snapshots.NotMatchedInsert] = m.notMatchedActions.map {
        case ia: InsertAction =>
          val vals = asgn(ia.assignments, "INSERT")
          if (vals.keySet != cols.toSet)
            refuse(s"INSERT must assign every column of '${t.tableName}' " +
              s"(got ${vals.keySet.toSeq.sorted.mkString(", ")})")
          Snapshots.NotMatchedInsert(ia.condition.map(onJoined), vals)
        case other => refuse(s"unsupported WHEN NOT MATCHED action: $other")
      }
      val bySource: Seq[Snapshots.WhenNotMatchedBySource] =
        m.notMatchedBySourceActions.map {
          case ua: UpdateAction =>
            Snapshots.BySourceUpdate(ua.condition.map(onJoined), asgn(ua.assignments, "UPDATE"))
          case da: DeleteAction =>
            Snapshots.BySourceDelete(da.condition.map(onJoined))
          case other => refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
        }

      // source rows projected onto the verb's contract: join-key
      // expressions under their key-column names plus every source
      // column under the `_mrg_src_` prefix — built on the SOURCE plan
      // (same instance → its resolved attrs stay valid)
      val srcCols = m.sourceTable.output.map(_.name)
      val srcDf = org.apache.spark.sql.GraftShim.ofRows(spark, m.sourceTable)
        .select(keys.map { case (k, e) =>
          org.apache.spark.sql.GraftShim.column(e).as(k) } ++
          m.sourceTable.output.map(a =>
            org.apache.spark.sql.GraftShim.column(a).as(Snapshots.SrcPrefix + a.name)): _*)
      GraftMergeCommand(t.root, t.tableName, srcDf, keyCols, srcCols,
        matched, notMatched, bySource, keyCols, residualOn)
  }
}

/** Conservative conjunctive inclusive-range ENVELOPE of a resolved
  * predicate: every matching row lies inside ALL returned ranges. The
  * translation goes per-conjunct through the engine's own v1 filter
  * translation (external values, casts folded), then bounds each v1
  * filter: =, ≥, ≤ directly; strict >/< widened to inclusive; IN to
  * [min, max]; OR as the per-column union of both sides' envelopes
  * (bounded only where BOTH sides bound the same column); anything
  * else contributes nothing (unbounded — correct, just unpruned).
  */
private[sources] object PredicateEnvelope {

  import org.apache.spark.sql.sources._

  /** Expand RuntimeReplaceables (BETWEEN & co.), inline their `With`
    * common-subexpression refs, and fold constant subtrees — yielding
    * a plain And/Or/comparison tree that both translates to v1 filters
    * and survives an unresolve → re-resolve round trip.
    */
  def expand(cond: Expression): Expression = cond.transformUp {
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        r.replacement
    }.transformUp {
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case ref: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            defs(ref.id)
        }
    }.transformUp {
      case e if e.foldable && !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] =>
        org.apache.spark.sql.catalyst.expressions.Literal.create(e.eval(), e.dataType)
    }

  /** Envelope of an ALREADY-expanded predicate (see [[expand]]). */
  def of(expanded: Expression): Seq[FileStats.ColRange] =
    conjuncts(expanded).flatMap { c =>
      org.apache.spark.sql.GraftShim.translateFilter(c)
        .map(f => envelope(f)).getOrElse(Nil)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def top(a: String): Boolean = !a.contains(".")

  /** v1 Filter → envelope ranges (empty = no information). */
  private def envelope(f: Filter): Seq[FileStats.ColRange] = f match {
    case EqualTo(a, v) if top(a) && v != null =>
      Seq(FileStats.ColRange(a, Some(v), Some(v)))
    case EqualNullSafe(a, v) if top(a) && v != null =>
      Seq(FileStats.ColRange(a, Some(v), Some(v)))
    case GreaterThan(a, v) if top(a) && v != null =>
      Seq(FileStats.ColRange(a, Some(v), None)) // inclusive superset of strict
    case GreaterThanOrEqual(a, v) if top(a) && v != null =>
      Seq(FileStats.ColRange(a, Some(v), None))
    case LessThan(a, v) if top(a) && v != null =>
      Seq(FileStats.ColRange(a, None, Some(v)))
    case LessThanOrEqual(a, v) if top(a) && v != null =>
      Seq(FileStats.ColRange(a, None, Some(v)))
    case In(a, vs) if top(a) && vs.nonEmpty && !vs.contains(null) =>
      (for { lo <- minOf(vs.toSeq); hi <- maxOf(vs.toSeq) }
        yield FileStats.ColRange(a, Some(lo), Some(hi))).toSeq
    case And(l, r) => envelope(l) ++ envelope(r)
    case Or(l, r) => union(envelope(l), envelope(r))
    case AlwaysTrue() => Nil
    case _ => Nil // NOT / IS NULL / != / unknown: unbounded, residual decides
  }

  /** Envelope of a disjunction: per column, [min(lo), max(hi)] — and
    * ONLY for columns both sides bound (a row may satisfy the other
    * disjunct anywhere on an unshared column).
    */
  private def union(l: Seq[FileStats.ColRange],
                    r: Seq[FileStats.ColRange]): Seq[FileStats.ColRange] = {
    def byCol(rs: Seq[FileStats.ColRange]): Map[String, FileStats.ColRange] =
      rs.groupBy(_.col).flatMap { case (c, group) =>
        // several ranges on one column conjoin (intersect): tightest lo/hi
        val los = group.flatMap(_.lo)
        val his = group.flatMap(_.hi)
        Some(FileStats.ColRange(c,
          if (los.isEmpty) None else maxOf(los),
          if (his.isEmpty) None else minOf(his))).map(c -> _)
      }
    val (lm, rm) = (byCol(l), byCol(r))
    lm.keySet.intersect(rm.keySet).toSeq.sorted.flatMap { c =>
      val (a, b) = (lm(c), rm(c))
      val lo = for { x <- a.lo; y <- b.lo; m <- minOf(Seq(x, y)) } yield m
      val hi = for { x <- a.hi; y <- b.hi; m <- maxOf(Seq(x, y)) } yield m
      if (lo.isEmpty && hi.isEmpty) None
      else Some(FileStats.ColRange(c, lo, hi))
    }
  }

  /** min/max over external filter values — None when the values are
    * not mutually comparable (the envelope then just doesn't bound).
    */
  private def minOf(vs: Seq[Any]): Option[Any] = reduceBy(vs, lt = true)
  private def maxOf(vs: Seq[Any]): Option[Any] = reduceBy(vs, lt = false)
  private def reduceBy(vs: Seq[Any], lt: Boolean): Option[Any] =
    try {
      Some(vs.reduce { (a, b) =>
        val c = a.asInstanceOf[Comparable[Any]].compareTo(b)
        if ((c <= 0) == lt) a else b
      })
    } catch { case _: ClassCastException | _: NullPointerException => None }
}

/** `DELETE FROM graft.db.t WHERE <any deterministic predicate>` —
  * envelope-pruned, exact-residual, executed through
  * [[SnapshotsDmlOps.deleteWhere]]'s copy-on-write rewrite; one
  * published version.
  */
/** `ALTER TABLE … ADD CONSTRAINT nm CHECK (expr)` → [[SnapshotsMetaOps
  * .addCheck]]: existing rows validated in one O(table) pass, the
  * `@check` line published atomically, enforcement on every later
  * row-introducing write.
  */
case class GraftAddCheckCommand(root: String, table: String,
                                name: String, conditionSql: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new Snapshots(session, root).addCheck(table, name, conditionSql)
    Seq.empty
  }
}

case class GraftDeleteCommand(root: String, table: String,
                              ranges: Seq[FileStats.ColRange],
                              pred: org.apache.spark.sql.Column,
                              statsCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new Snapshots(session, root).deleteWhere(table, ranges, pred,
      statsCols.filter(_.nonEmpty))
    Seq.empty
  }
}

/** `UPDATE graft.db.t SET … WHERE <any deterministic predicate>` —
  * same split, through [[SnapshotsDmlOps.updateWhere]].
  */
case class GraftUpdateCommand(root: String, table: String,
                              ranges: Seq[FileStats.ColRange],
                              pred: org.apache.spark.sql.Column,
                              sets: Map[String, org.apache.spark.sql.Column],
                              statsCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new Snapshots(session, root).updateWhere(table, ranges, pred, sets,
      statsCols.filter(_.nonEmpty))
    Seq.empty
  }
}

/** `MERGE INTO graft.db.t USING … ON … WHEN …` (full clause matrix)
  * executed through [[SnapshotsDmlOps.mergeClauses]] — leading-key-span
  * pruning (whole table when BY SOURCE arms present), one full-outer
  * join over the touched files, one published version.
  */
case class GraftMergeCommand(root: String, table: String,
                             source: org.apache.spark.sql.DataFrame,
                             keyCols: Seq[String], srcCols: Seq[String],
                             matched: Seq[Snapshots.WhenMatched],
                             notMatched: Seq[Snapshots.NotMatchedInsert],
                             bySource: Seq[Snapshots.WhenNotMatchedBySource],
                             statsCols: Seq[String],
                             residualOn: Option[org.apache.spark.sql.Column] = None)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new Snapshots(session, root).mergeClauses(table, source, keyCols,
      matched, notMatched, bySource, statsCols, sourceProjected = true,
      residualOn = residualOn)
    Seq.empty
  }
}
