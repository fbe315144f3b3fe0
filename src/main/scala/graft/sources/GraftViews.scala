package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** PERSISTENT SQL VIEWS over the lake — the text analog of the
  * reference's reusable `[sql|…|]` templates (reference
  * QueryBuilder.hs:153-187: a named query fragment spliced into later
  * queries), stored in the lake itself so every reader of the lake
  * sees the same definitions:
  *
  * {{{
  *   CREATE VIEW graft.db.big_orders AS
  *     SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100
  *   SELECT count(*) FROM graft.db.big_orders        -- resolves at read
  *   CREATE OR REPLACE VIEW graft.db.big_orders AS …  -- atomic swap
  *   DROP VIEW graft.db.big_orders
  * }}}
  *
  * ARCHITECTURE (the Iceberg route SURVEY §8 cites — OSS Spark 4.1
  * ships the `ViewCatalog` developer API but its analyzer never calls
  * `loadView`, and `ResolveSessionCatalog` refuses view DDL on v2
  * catalogs; Iceberg ships views via its own injected parser +
  * resolver extensions, public design):
  *
  *  - DDL: an injected [[ParserInterface]] wrapper ([[GraftSqlParser]])
  *    post-processes the delegate's parse — a `CreateView`/`DropView`
  *    whose 3-part identifier names a [[GraftCatalog]] becomes the
  *    engine's own runnable command; every other statement passes
  *    through byte-identical. The definition is stored as TEXT in the
  *    lake manifest (`<name>@view=<urlencoded SQL>`, one metadata-only
  *    commit — zero data IO, rides clone/restore/time-travel like
  *    every manifest line).
  *  - READS: [[GraftCatalog.loadTable]] vends a [[GraftViewTable]] for
  *    a name carrying an `@view` line, and the [[GraftLakeReads]]
  *    analysis rule replaces the relation with the stored query's
  *    analyzed plan — so a view read IS its defining query's plan:
  *    full pushdown/pruning through the substituted manifest scans,
  *    nothing materialized.
  *
  * VERSION CONTRACT: a view resolves every referenced table (and
  * nested view) at the SNAPSHOT VERSION BEING READ — a plain read uses
  * the lake head, `VERSION AS OF v` resolves the view line AND its
  * body at v (the definition travels with the lake; a view read can
  * never mix table states from two versions). References are BARE
  * single-part names in the view's own lake — qualified references
  * refuse at CREATE (a cross-lake view would pin this lake's version
  * axis onto another lake's tables, silently incoherent). Cycles
  * refuse at CREATE by transitive walk (and a belt-and-braces depth
  * guard at resolution); the defining query is fully analyzed at
  * CREATE so bad SQL refuses at the statement, not at first read.
  */
object GraftViews {

  private def refuse(msg: String): Nothing =
    throw new IllegalArgumentException(s"view: $msg")

  private[sources] def encodeSql(sql: String): String =
    java.net.URLEncoder.encode(sql, "UTF-8")
  private[sources] def decodeSql(v: String): String =
    java.net.URLDecoder.decode(v, "UTF-8")

  /** The stored defining SQL of `name` at `version` (default head) —
    * None if no such view.
    */
  def spec(sn: Snapshots, name: String, version: Option[Long] = None): Option[String] =
    version.orElse(sn.currentVersion).flatMap(v =>
      sn.readManifest(v).get(name + sn.ViewSuffix).map(decodeSql))

  /** View names at `version` (default head). */
  def names(sn: Snapshots, version: Option[Long] = None): Seq[String] =
    version.orElse(sn.currentVersion).toSeq.flatMap(v =>
      sn.readManifest(v).keys.filter(_.endsWith(sn.ViewSuffix))
        .map(_.stripSuffix(sn.ViewSuffix))).sorted

  /** The view's DataFrame at `version` (default head): the stored
    * query with every bare table reference replaced by the engine's
    * manifest-planned read AT THAT VERSION, nested views expanded
    * recursively. The plan is the defining query's plan — filter
    * pushdown, column pruning and stats-driven join strategy all apply
    * to the substituted scans.
    */
  def df(sn: Snapshots, name: String, version: Option[Long] = None): DataFrame = {
    val pinned = version.orElse(sn.currentVersion).getOrElse(
      refuse(s"lake has no commits under ${sn.rootPath}"))
    val m = sn.readManifest(pinned)
    val sql = m.getOrElse(name + sn.ViewSuffix,
      throw new NoSuchElementException(
        s"'$name' is not a view under ${sn.rootPath} at version $pinned")) match {
      case v => decodeSql(v)
    }
    org.apache.spark.sql.GraftShim.ofRows(sn.s,
      expand(sn, m, pinned, name, sql, List(name)))
  }

  /** Parse `sql` and substitute every bare table reference: a nested
    * view expands recursively (cycle-guarded), a table becomes the
    * engine's analyzed manifest read at `pinned` (with the same
    * stats-driven SHUFFLE_HASH sizing the catalog read path applies).
    */
  private def expand(sn: Snapshots, m: Map[String, String], pinned: Long,
                     owner: String, sql: String, stack: List[String]): LogicalPlan = {
    if (stack.length > 16) refuse(
      s"view expansion exceeds depth 16 (${stack.reverse.mkString(" -> ")})")
    val plan = sn.s.sessionState.sqlParser.parsePlan(sql)
    // Scope-accurate substitution, by explicit recursion rather than a
    // transform (no transform both descends into expression subqueries
    // AND threads lexical scope):
    //  - relations inside IN/EXISTS/scalar subqueries pin to the SAME
    //    snapshot version as the main body (a naive transformUp never
    //    reaches them and would silently bind session state);
    //  - a WITH-clause name shadows a colliding lake table ONLY within
    //    its own scope (UnresolvedWith child + CTE definition bodies,
    //    which are INNER children no transform visits) — the same name
    //    outside that scope is still a lake reference, so it can never
    //    silently fall through to a session temp view;
    //  - CTE names compare case-insensitively, matching the resolver.
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def substitute(p: LogicalPlan, scope: Set[String]): LogicalPlan = p match {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        // every name of this WITH is in scope for the main child and
        // for the definition bodies (Spark permits back-references;
        // a forward reference fails loudly at analysis)
        val inner = scope ++ w.cteRelations.map(t => lower(t._1))
        w.copy(
          cteRelations = w.cteRelations.map { case (n, sa, mx) =>
            (n, SubqueryAlias(sa.identifier, substitute(sa.child, inner)), mx)
          },
          child = substitute(w.child, inner))
      case r: UnresolvedRelation if r.multipartIdentifier.length > 1 =>
        refuse(s"'$owner' references '${r.multipartIdentifier.mkString(".")}' — " +
          "a view references bare single-part names resolved in its own lake " +
          "(a qualified reference would mix version axes)")
      case r: UnresolvedRelation if scope.contains(lower(r.multipartIdentifier.head)) =>
        r // a CTE reference: the analyzer resolves it within its WITH
      case r: UnresolvedRelation =>
        val t = r.multipartIdentifier.head
        if (m.contains(t + sn.ViewSuffix)) {
          if (stack.contains(t)) refuse(
            s"cyclic view definition: ${(t :: stack).reverse.mkString(" -> ")}")
          SubqueryAlias(t,
            expand(sn, m, pinned, t, decodeSql(m(t + sn.ViewSuffix)), t :: stack))
        } else if (sn.dataEntries(m).contains(t)) {
          val read = sn.read(t, Some(pinned)).queryExecution.analyzed
          SubqueryAlias(t, GraftLakeReads.maybeShuffleHash(sn.s, sn, t, pinned, read))
        } else refuse(s"'$owner' references '$t', which is neither a table nor " +
          s"a view under ${sn.rootPath} at version $pinned")
      case other =>
        val kids = other.mapChildren(c => substitute(c, scope))
        kids.transformExpressions {
          case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
            sq.withNewPlan(substitute(sq.plan, scope))
        }
    }
    substitute(plan, Set.empty)
  }

  /** CREATE [OR REPLACE] VIEW: validates (parseable, references exist,
    * single-part, acyclic INCLUDING through the new definition, fully
    * analyzable), then publishes the `@view` line in one metadata-only
    * commit. Returns the published version; `ifNotExists` on an
    * existing view is a no-op returning the current head.
    */
  def create(sn: Snapshots, name: String, sql: String,
             replace: Boolean = false, ifNotExists: Boolean = false): Long = {
    require(!sn.isMetaEntry(name) && !name.contains("@"),
      s"view name '$name' would collide with the reserved manifest line format")
    var attempt = sn.currentVersion.getOrElse(
      refuse("lake has no commits — create the referenced tables first")) + 1
    for (_ <- 1 to sn.MaxAttempts) {
      val head = sn.currentVersion.get
      val cur = sn.readManifest(head)
      if (cur.contains(name + sn.MatviewSuffix))
        refuse(s"'$name' is a MATERIALIZED VIEW under ${sn.rootPath} — " +
          "CALL graft.system.drop_matview first")
      if (sn.dataEntries(cur).contains(name))
        refuse(s"'$name' is a TABLE under ${sn.rootPath} — drop it first " +
          "(a view cannot shadow a table)")
      if (cur.contains(name + sn.ViewSuffix) && !replace) {
        if (ifNotExists) return head
        refuse(s"view '$name' already exists under ${sn.rootPath} " +
          "(CREATE OR REPLACE VIEW to redefine)")
      }
      // validate against the manifest WITH the candidate installed:
      // self/transitive cycles through the new definition refuse, the
      // full query analyzes (schema derivable) before anything publishes
      val overlay = cur + ((name + sn.ViewSuffix) -> encodeSql(sql))
      org.apache.spark.sql.GraftShim.ofRows(sn.s,
        expand(sn, overlay, head, name, sql, List(name))).schema
      if (sn.writeManifest(attempt, overlay)) return attempt
      attempt = math.max(attempt + 1, sn.currentVersion.getOrElse(0L) + 1)
    }
    throw new IllegalStateException(
      s"view publish lost ${sn.MaxAttempts} consecutive version races under ${sn.rootPath}")
  }

  /** DROP VIEW: removes the `@view` line (one metadata-only commit).
    * False if no such view. Standing views that REFERENCE the dropped
    * one keep their text and refuse loudly at next read — same
    * contract as dropping a referenced table.
    */
  def drop(sn: Snapshots, name: String): Boolean = {
    var attempt = sn.currentVersion.getOrElse(return false) + 1
    for (_ <- 1 to sn.MaxAttempts) {
      val cur = sn.readManifest(sn.currentVersion.get)
      if (!cur.contains(name + sn.ViewSuffix)) return false
      if (sn.writeManifest(attempt, cur - (name + sn.ViewSuffix))) return true
      attempt = math.max(attempt + 1, sn.currentVersion.getOrElse(0L) + 1)
    }
    throw new IllegalStateException(
      s"view drop lost ${sn.MaxAttempts} consecutive version races under ${sn.rootPath}")
  }

  /** `c40_sql_view`: the template surface as PURE TEXT — CREATE VIEW,
    * a second view stacked on the first (nested expansion), reads
    * through both, CREATE OR REPLACE swapping a definition atomically.
    * The oracle recomputes the final nested query from the base table.
    */
  def c40SqlView(s: SparkSession, dir: String): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    Catalog.register(s, dir)
    val ns = "db_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    s.sql(s"CREATE NAMESPACE graft.$ns")
    s.sql(s"CREATE TABLE graft.$ns.orders_v (o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT)")
    s.sql(s"""INSERT INTO graft.$ns.orders_v
             |SELECT o_orderkey, o_orderstatus,
             |       CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |FROM orders""".stripMargin)
    // a filtered base view, then an aggregate view stacked on it
    s.sql(s"""CREATE VIEW graft.$ns.paid AS
             |SELECT o_orderkey, o_orderstatus, cents
             |FROM orders_v WHERE o_orderstatus <> 'P'""".stripMargin)
    s.sql(s"""CREATE VIEW graft.$ns.by_status AS
             |SELECT o_orderstatus, count(*) AS n, sum(cents) AS total_cents
             |FROM paid GROUP BY o_orderstatus""".stripMargin)
    // OR REPLACE is an atomic definition swap: tighten the base filter
    // and the stacked view follows (expansion happens at read)
    s.sql(s"""CREATE OR REPLACE VIEW graft.$ns.paid AS
             |SELECT o_orderkey, o_orderstatus, cents
             |FROM orders_v WHERE o_orderstatus <> 'P' AND cents >= 500000""".stripMargin)
    s.sql(s"""SELECT o_orderstatus, n, total_cents
             |FROM graft.$ns.by_status ORDER BY o_orderstatus""".stripMargin)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("c40_sql_view" -> c40SqlView _)

  val oracles: Map[String, String] = Map(
    "c40_sql_view" ->
      """WITH paid AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_orderstatus <> 'P'
        |    AND CAST(round(o_totalprice * 100, 0) AS BIGINT) >= 500000
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM paid GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
}

/** Injected SQL parser ([[org.apache.spark.sql.SparkSessionExtensions
  * .injectParser]]): delegates EVERYTHING to Spark's parser, then
  * rewrites a top-level `CreateView`/`DropView` whose 3-part
  * identifier names a [[GraftCatalog]] into the engine's runnable
  * command — the statement never reaches `ResolveSessionCatalog`'s
  * v2-views refusal. Identifiers must be fully qualified
  * (`catalog.lake.name`); anything else passes through to Spark's own
  * (loud) handling. View DDL inside SQL-scripting compound blocks is
  * not rewritten (the script executor parses statements through the
  * same entry point one at a time, so top-level coverage suffices for
  * c38-style scripts too).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def graftTarget(parts: Seq[String]): Option[(String, String, String)] =
    if (parts.length == 3 && session.conf.getOption(s"spark.sql.catalog.${parts.head}")
          .contains(classOf[GraftCatalog].getName))
      Some((parts.head, parts(1), parts(2)))
    else None

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView => cv.child match {
      case u: UnresolvedIdentifier => graftTarget(u.nameParts) match {
        case Some((cat, lake, name)) =>
          def refuse(what: String): Nothing = throw new UnsupportedOperationException(
            s"CREATE VIEW on a graft catalog does not support $what")
          if (cv.userSpecifiedColumns.nonEmpty)
            refuse("a column list — alias the columns in the SELECT instead")
          if (cv.properties.nonEmpty) refuse("TBLPROPERTIES")
          if (cv.collation.nonEmpty) refuse("DEFAULT COLLATION")
          val text = cv.originalText.getOrElse(refuse("a query without source text"))
          GraftCreateViewCommand(cat, lake, name, text, cv.replace, cv.allowExisting)
        case None => cv
      }
      case _ => cv
    }
    case dv: DropView => dv.child match {
      case u: UnresolvedIdentifier => graftTarget(u.nameParts) match {
        case Some((cat, lake, name)) =>
          GraftDropViewCommand(cat, lake, name, dv.ifExists)
        case None => dv
      }
      case _ => dv
    }
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

private[sources] object GraftViewCommands {
  def snapshots(session: SparkSession, catalog: String, lake: String): Snapshots = {
    val root = session.conf.getOption(s"spark.sql.catalog.$catalog.root").getOrElse(
      throw new IllegalStateException(
        s"catalog '$catalog' lost its spark.sql.catalog.$catalog.root setting"))
    new Snapshots(session, s"$root/$lake")
  }
}

/** `CREATE [OR REPLACE] VIEW catalog.lake.name AS <query>` →
  * [[GraftViews.create]] (validate + one metadata-only manifest commit).
  */
case class GraftCreateViewCommand(catalog: String, lake: String, name: String,
                                  sql: String, replace: Boolean,
                                  allowExisting: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    GraftViews.create(GraftViewCommands.snapshots(session, catalog, lake),
      name, sql, replace, allowExisting)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] catalog.lake.name` → [[GraftViews.drop]]. */
case class GraftDropViewCommand(catalog: String, lake: String, name: String,
                                ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val dropped = GraftViews.drop(
      GraftViewCommands.snapshots(session, catalog, lake), name)
    if (!dropped && !ifExists)
      throw new NoSuchElementException(
        s"view '$name' not found under catalog $catalog, lake $lake " +
          "(DROP VIEW IF EXISTS to tolerate)")
    Seq.empty
  }
}
