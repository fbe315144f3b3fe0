package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.functions._

/** SQL-ADDRESSABLE MATERIALIZED VIEWS — the [[IncrementalAgg]]
  * substrate (delta-maintained aggregate + atomic (rows, watermark)
  * commits, invariant under source maintenance) lifted to a TEXT
  * surface, completing the reference's stream-into-compute north star
  * (reference README.md:10-14: stream changes into a standing derived
  * result) as something an analyst reaches without Scala:
  *
  * {{{
  *   CALL graft.system.create_matview('db', 'mv',
  *     'SELECT status, count(*) AS n, sum(cents) AS total
  *      FROM orders GROUP BY status')
  *   -- ... INSERT / DELETE / UPDATE / MERGE / compact on orders ...
  *   CALL graft.system.refresh_matview('db', 'mv')
  *   SELECT * FROM graft.db.mv        -- an ordinary lake table
  *   CALL graft.system.drop_matview('db', 'mv')
  * }}}
  *
  * The defining SQL is carried in the mv's `@matview` manifest line
  * (src table, url-encoded SQL, watermark version); the rows are an
  * ordinary lake table, so reads, time travel and DESCRIBE are free.
  * Refresh diffs the source between the watermark and head via
  * [[Snapshots.readChanges]] — O(changed files), untouched files never
  * scanned — folds the signed deltas into the stored rows, and
  * publishes (new rows, new watermark) in ONE manifest write: a
  * crashed refresh leaves the old pair intact (TxnSpec arms the
  * pre-publish fault hook), and a compaction of the source folds to a
  * no-op (moved rows cancel group-wise).
  *
  * MAINTAINABILITY CONTRACT (the Materialize/stream-processor
  * restriction class, public design): the defining query must be
  *
  * {{{ SELECT <group exprs / count(*) / count(x) / sum(x) aliased>
  *     FROM <one table in the same lake> [WHERE <row predicate>]
  *     GROUP BY <the group exprs> }}}
  *
  * count/sum are self-maintainable under inserts AND deletes; at
  * least one `count(*)` is REQUIRED (it is the group-liveness witness
  * — a group whose count reaches zero leaves the view). avg is
  * DERIVABLE (select sum and count, divide when reading); min/max are
  * NOT delta-maintainable under deletes without keeping per-group
  * heaps — both refuse loudly at CREATE, never silently degrade to
  * recompute. DISTINCT aggregates, HAVING, joins, subqueries and
  * ORDER BY refuse likewise: this surface promises O(changes)
  * refresh, and anything it accepts must keep that promise at 100 TB.
  */
object Matview {

  /** Parsed + validated defining query. `groups`/`aggs` carry the SQL
    * text of each expression (re-parsed with `expr()` at compute time,
    * so full + delta paths evaluate literally the same expressions).
    */
  final case class Parsed(src: String,
                          where: Option[String],
                          groups: Seq[(String, String)], // (alias, exprSql)
                          aggs: Seq[AggSpec],
                          selectOrder: Seq[String])      // output column order

  sealed trait AggSpec { def alias: String }
  final case class CountStar(alias: String) extends AggSpec
  final case class CountCol(alias: String, arg: String) extends AggSpec
  final case class SumCol(alias: String, arg: String) extends AggSpec

  /** Manifest line codec (url-encoded map, the `@props` format). */
  private[sources] def encodeLine(src: String, sql: String, wm: Long): String =
    s"src:${java.net.URLEncoder.encode(src, "UTF-8")};" +
      s"sql:${java.net.URLEncoder.encode(sql, "UTF-8")};wm:$wm"

  private[sources] def decodeLine(v: String): (String, String, Long) = {
    val m = v.split(";").map { kv =>
      val i = kv.indexOf(':')
      kv.substring(0, i) -> java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8")
    }.toMap
    (m("src"), m("sql"), m("wm").toLong)
  }

  private def refuse(msg: String): Nothing =
    throw new IllegalArgumentException(s"matview: $msg")

  /** Parse + validate a defining query into its maintainable parts.
    * Every refusal names the construct and the reason — the analyst
    * fixes the SQL, not a stack trace.
    */
  def parse(s: SparkSession, sql: String): Parsed = {
    val plan: LogicalPlan = s.sessionState.sqlParser.parsePlan(sql)
    val agg = plan match {
      case a: Aggregate => a
      case _: org.apache.spark.sql.catalyst.plans.logical.Sort =>
        refuse("ORDER BY is not maintainable (a materialized view is an " +
          "unordered table — order in the reading query)")
      case other => refuse(s"defining query must be a grouped aggregate " +
        s"(SELECT … FROM t [WHERE …] GROUP BY …), got ${other.nodeName}")
    }
    if (agg.child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Distinct])
      refuse("DISTINCT is not maintainable")
    val (whereSql, rel) = agg.child match {
      case r: UnresolvedRelation => (None, r)
      case Filter(cond, r: UnresolvedRelation) => (Some(cond.sql), r)
      case other => refuse(s"FROM must be one table of the same lake, " +
        s"optionally filtered (got ${other.nodeName}: joins/subqueries are " +
        "not O(changes)-maintainable — materialize inputs first)")
    }
    if (rel.multipartIdentifier.length != 1)
      refuse(s"source '${rel.multipartIdentifier.mkString(".")}' must be a " +
        "bare table name resolved in the matview's own lake")
    val src = rel.multipartIdentifier.head
    val groupSqls = agg.groupingExpressions.map(_.sql)
    var groups = Vector.empty[(String, String)]
    var aggs = Vector.empty[AggSpec]
    var order = Vector.empty[String]

    def aggSpec(alias: String, f: UnresolvedFunction): AggSpec = {
      val name = f.nameParts.map(_.toLowerCase).mkString(".")
      if (f.isDistinct) refuse(s"$name(DISTINCT …) is not delta-maintainable " +
        "(a distinct set cannot be maintained from counts alone)")
      if (f.filter.nonEmpty) refuse(s"$name(…) FILTER (WHERE …) is not supported " +
        "— move the predicate into the view's WHERE or a CASE inside the argument")
      name match {
        case "count" => f.arguments match {
          case Seq(_: UnresolvedStar) => CountStar(alias)
          case Seq(Literal(1, _)) => CountStar(alias)
          case Seq(a) => CountCol(alias, a.sql)
          case _ => refuse("count takes one argument or *")
        }
        case "sum" => f.arguments match {
          case Seq(a) => SumCol(alias, a.sql)
          case _ => refuse("sum takes exactly one argument")
        }
        case "avg" | "mean" => refuse("avg is derivable, not maintainable: " +
          "select sum(x) AS sx and count(*) AS n, read sx / n")
        case "min" | "max" => refuse(s"$name is not delta-maintainable under " +
          "deletes (a removed extremum needs the full group to re-derive) — " +
          "recompute with CREATE OR REPLACE TABLE … AS SELECT instead")
        case other => refuse(s"aggregate '$other' is not maintainable " +
          "(supported: count(*), count(x), sum(x))")
      }
    }

    agg.aggregateExpressions.foreach { ne =>
      val (alias, child): (Option[String], Expression) = ne match {
        case Alias(c, n) => (Some(n), c)
        case UnresolvedAlias(c, _) => (None, c)
        case a: UnresolvedAttribute => (None, a)
        case other => (None, other)
      }
      child match {
        case f: UnresolvedFunction =>
          val n = alias.getOrElse(refuse(
            s"aggregate ${f.nameParts.mkString(".")}(…) must be aliased " +
              "(AS <name>) — the alias is the mv's column name"))
          aggs :+= aggSpec(n, f)
          order :+= n
        case g if groupSqls.contains(g.sql) =>
          val n = alias.getOrElse(g match {
            case a: UnresolvedAttribute => a.nameParts.last
            case _ => refuse(s"group expression ${g.sql} must be aliased (AS <name>)")
          })
          groups :+= (n -> g.sql)
          order :+= n
        case other => refuse(s"select item ${other.sql} is neither a GROUP BY " +
          "expression nor a maintainable aggregate")
      }
    }
    if (groups.isEmpty) refuse("GROUP BY is required (a global aggregate is " +
      "GROUP BY over a constant — add one)")
    if (groups.size != groupSqls.size) refuse("every GROUP BY expression must " +
      s"appear in the select list (grouped: ${groupSqls.mkString(", ")}; " +
      s"selected: ${groups.map(_._2).mkString(", ")})")
    if (!aggs.exists(_.isInstanceOf[CountStar]))
      refuse("the select list must include count(*) — it is the group-liveness " +
        "witness (a group deleted from the source leaves the view when its " +
        "count reaches zero)")
    Parsed(src, whereSql, groups, aggs, order)
  }

  /** `sum(x)` needs maintenance state the visible row doesn't carry:
    * SQL's sum over zero non-null inputs is NULL, not 0, and a delta
    * fold cannot tell "all inputs left" from "inputs netted to 0"
    * without the non-null input count. Each SumCol therefore stores a
    * hidden `_nn_<alias>` companion (count of non-null args, folded
    * like any count); the visible sum is NULL exactly when its
    * companion reaches 0. Companions are part of the matview's stored
    * schema (SELECT the named aggregates; `*` shows the state).
    */
  private def nnCol(alias: String): String = s"_nn_$alias"

  private def aggColumns(p: Parsed): Seq[Column] = p.aggs.flatMap {
    case CountStar(n) => Seq(count(lit(1)).as(n))
    case CountCol(n, a) => Seq(count(expr(a)).as(n))
    case SumCol(n, a) => Seq(sum(expr(a)).as(n), count(expr(a)).as(nnCol(n)))
  }

  /** The stored column order: the defining query's output, then the
    * sum companions.
    */
  private def storedOrder(p: Parsed): Seq[String] =
    p.selectOrder ++ p.aggs.collect { case SumCol(n, _) => nnCol(n) }

  /** Full O(table) compute of the view at one snapshot — paid once at
    * CREATE (and never again; refresh is O(changes)).
    */
  def fullAggregate(src: DataFrame, p: Parsed): DataFrame = {
    val base = p.where.map(w => src.where(expr(w))).getOrElse(src)
    val cols = aggColumns(p)
    base.groupBy(p.groups.map { case (n, e) => expr(e).as(n) }: _*)
      .agg(cols.head, cols.tail: _*)
      .select(storedOrder(p).map(col): _*)
  }

  /** Signed per-group deltas from one change feed (`_change` ∈
    * added/removed): an in-place update surfaces as remove+add and
    * nets to its value change; rows merely moved by a compaction
    * cancel exactly.
    */
  def deltaAggregate(changes: DataFrame, p: Parsed): DataFrame = {
    val base = p.where.map(w => changes.where(expr(w))).getOrElse(changes)
    val sign = when(col("_change") === "added", 1L).otherwise(-1L)
    val signedCountNonNull = (a: String) =>
      sum(when(expr(a).isNotNull, sign).otherwise(lit(0L)))
    val cols: Seq[Column] = p.aggs.flatMap {
      case CountStar(n) => Seq(sum(sign).as(n))
      case CountCol(n, a) => Seq(signedCountNonNull(a).as(n))
      case SumCol(n, a) =>
        Seq(sum(sign * expr(a)).as(n), signedCountNonNull(a).as(nnCol(n)))
    }
    base.groupBy(p.groups.map { case (n, e) => expr(e).as(n) }: _*)
      .agg(cols.head, cols.tail: _*)
  }

  /** Fold deltas into the stored rows (full-outer on the group key:
    * new groups appear, dead groups leave when the count(*) witness
    * reaches zero). O(|mv| + |deltas|), never O(source).
    *
    * The join is NULL-SAFE on the group key (`<=>`): a NULL group is a
    * real group in SQL semantics — a plain equality join would never
    * match it, splitting it into immortal duplicate rows. Sum columns
    * fold through their `_nn_` companion: NULL exactly when zero
    * non-null inputs remain (the sum-over-empty contract a
    * coalesce-to-0 fold silently breaks).
    */
  def fold(stored: DataFrame, deltas: DataFrame, p: Parsed): DataFrame = {
    val storedCols = storedOrder(p)
    val d = deltas.select(
      p.groups.map { case (n, _) => col(n).as(s"_g_$n") } ++
        storedCols.filterNot(n => p.groups.exists(_._1 == n))
          .map(n => col(n).as(s"_d_$n")): _*)
    val liveness = p.aggs.collectFirst { case CountStar(n) => n }.get
    val cond = p.groups.map { case (n, _) => col(n) <=> col(s"_g_$n") }
      .reduce(_ && _)
    def folded(n: String): Column =
      coalesce(col(n), lit(0L)) + coalesce(col(s"_d_$n"), lit(0L))
    stored.join(d, cond, "full_outer")
      .select(storedCols.map { n =>
        if (p.groups.exists(_._1 == n)) coalesce(col(n), col(s"_g_$n")).as(n)
        else p.aggs.collectFirst { case SumCol(s, _) if s == n => s } match {
          case Some(_) =>
            when(folded(nnCol(n)) === 0L, lit(null)).otherwise(folded(n)).as(n)
          case None => folded(n).as(n)
        }
      }: _*)
      .where(col(liveness) =!= 0L)
  }

  /** CREATE: full compute at the lake head, rows + `@matview` line in
    * ONE manifest publish. Refuses if `mv` exists (table or view).
    */
  def create(sn: Snapshots, mv: String, sql: String): (Long, Long) = {
    require(!sn.isMetaEntry(mv),
      s"matview name '$mv' collides with the reserved '@' manifest lines")
    val p = parse(sn.s, sql)
    require(p.src != mv, s"matview '$mv' cannot be defined over itself")
    val head = sn.currentVersion.getOrElse(
      refuse(s"lake has no commits — create the source table first"))
    require(sn.tableNames(Some(head)).contains(p.src),
      s"matview source table '${p.src}' not committed under ${sn.rootPath}")
    val rows = fullAggregate(sn.read(p.src, Some(head)), p)
    val v = publish(sn, mv, Some(rows), encodeLine(p.src, sql, head),
      mustExist = false)
    (v, head)
  }

  /** REFRESH: fold the source's (watermark, head] deltas in; publishes
    * rows + advanced watermark in ONE manifest write. Returns
    * (head version after the call, fromVersion, toVersion); from == to
    * means nothing folded. A refresh with NO source changes publishes
    * NOTHING (no self-chasing: the refresh's own publish does not touch
    * the source, so the next refresh no-ops) — except when the
    * unfolded version gap exceeds `compressAfter`, where one
    * metadata-only publish advances the watermark so the per-refresh
    * touched-scan stays O(compressAfter) manifest headers instead of
    * growing with unrelated commit traffic.
    */
  def refresh(sn: Snapshots, mv: String, compressAfter: Int = 16): (Long, Long, Long) = {
    val head = sn.currentVersion.getOrElse(
      throw new IllegalStateException(s"no commits under ${sn.rootPath}"))
    val line = sn.readManifest(head).getOrElse(mv + sn.MatviewSuffix,
      throw new NoSuchElementException(
        s"'$mv' is not a materialized view under ${sn.rootPath} " +
          "(CALL graft.system.create_matview first)"))
    val (src, sql, wm) = decodeLine(line)
    if (wm == head) return (head, wm, wm)
    // cheap driver-side screen: did any version in (wm, head] actually
    // change the source's DATA (entry, file list, deletion vector)?
    // Narrower than tableTouchedAt: the @maint marker is per-version
    // and its disappearance on the NEXT publish is not a data change —
    // counting it would make every post-compact refresh fold an empty
    // delta and publish needlessly. (Cached manifest views, zero IO.)
    def srcChangedAt(v: Long): Boolean = {
      if (v <= 1L) return true
      val prev = sn.readManifest(v - 1); val cur = sn.readManifest(v)
      Seq(src, src + sn.FilesSuffix, src + sn.DvSuffix)
        .exists(k => prev.get(k) != cur.get(k))
    }
    val touched = ((wm + 1) to head).exists(srcChangedAt)
    if (!touched) {
      if (head - wm >= compressAfter) {
        val v = publish(sn, mv, None, encodeLine(src, sql, head), mustExist = true)
        return (v, wm, wm)
      }
      return (head, wm, wm)
    }
    val p = parse(sn.s, sql)
    val deltas = deltaAggregate(sn.readChanges(src, wm, head), p)
    val folded = fold(sn.read(mv, Some(head)), deltas, p)
    val v = publish(sn, mv, Some(folded), encodeLine(src, sql, head),
      mustExist = true)
    (v, wm, head)
  }

  /** One optimistic publish of (optionally re-staged rows, line). With
    * `data = None` the standing data entry (and its read metadata)
    * carries over and only the `@matview` line changes.
    */
  private def publish(sn: Snapshots, mv: String, data: Option[DataFrame],
                      line: String, mustExist: Boolean): Long = {
    var attempt = sn.currentVersion.getOrElse(0L) + 1
    var staged: Option[Map[String, String]] = None
    for (_ <- 1 to sn.MaxAttempts) {
      val cur = sn.currentVersion.map(sn.readManifest).getOrElse(Map.empty[String, String])
      val exists = sn.dataEntries(cur).contains(mv)
      if (mustExist) require(exists,
        s"materialized view table '$mv' missing under ${sn.rootPath}")
      else require(!exists && !cur.contains(mv + sn.MatviewSuffix) &&
        !cur.contains(mv + sn.ViewSuffix),
        s"'$mv' already exists under ${sn.rootPath}")
      val lines: Map[String, String] = data match {
        case Some(df) =>
          val w = staged.getOrElse {
            val w0 = sn.stageTables(Map(mv -> df), Map.empty, attempt)
            staged = Some(w0); w0
          }
          // drop the mv's previous lines, keep everything else
          w + ((mv + sn.MatviewSuffix) -> line)
        case None => Map((mv + sn.MatviewSuffix) -> line)
      }
      val base =
        if (data.isDefined)
          cur.filterNot { case (k, _) => k == mv || k.startsWith(mv + "@") }
        else cur
      sn.faultHook("pre-publish:matview") // crash point: staged, old (rows, wm) intact
      if (sn.writeManifest(attempt, base ++ lines)) return attempt
      attempt = math.max(attempt + 1, sn.currentVersion.getOrElse(0L) + 1)
    }
    throw new IllegalStateException(
      s"matview publish lost ${sn.MaxAttempts} consecutive version races under ${sn.rootPath}")
  }

  /** The stored (source table, defining SQL, watermark version) of a
    * matview at head — None if `mv` is not a materialized view. The
    * inspection surface DESCRIBE-style tooling (and tests) read.
    */
  def spec(sn: Snapshots, mv: String): Option[(String, String, Long)] =
    sn.currentVersion.flatMap(v =>
      sn.readManifest(v).get(mv + sn.MatviewSuffix).map(decodeLine))

  /** DROP: removes the rows table and the `@matview` line in one
    * metadata commit. False if no such matview.
    */
  def drop(sn: Snapshots, mv: String): Boolean =
    sn.currentVersion.exists { head =>
      sn.readManifest(head).contains(mv + sn.MatviewSuffix) && sn.dropTable(mv)
    }

  /** `c39_sql_matview`: the CDC-consumer loop (c09/st08) as PURE TEXT —
    * seed a lake table, CREATE MATVIEW over it via CALL, mutate the
    * source with ordinary SQL DML (INSERT + ranged DELETE), REFRESH via
    * CALL, and read the view as a plain catalog table. The oracle is
    * DuckDB's from-scratch recompute of the source's head state: a
    * dropped delta, double-fold, or mis-signed pre-image anywhere in
    * the change feed → fold → atomic (rows, watermark) publish flips n
    * or total_cents. Per-run namespace keeps re-runs idempotent; every
    * invocation exercises the real create/refresh CALLs.
    */
  def c39SqlMatview(s: SparkSession, dir: String): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    Catalog.register(s, dir)
    val ns = "db_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    s.sql(s"CREATE NAMESPACE graft.$ns")
    s.sql(s"CREATE TABLE graft.$ns.orders_m (o_orderkey BIGINT, o_orderstatus STRING, price_cents BIGINT)")
    s.sql(s"""INSERT INTO graft.$ns.orders_m
             |SELECT o_orderkey, o_orderstatus,
             |       CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |FROM orders WHERE o_orderkey % 3 <> 0""".stripMargin)
    s.sql(s"""CALL graft.system.create_matview('$ns', 'mv_status',
             |  'SELECT o_orderstatus, count(*) AS n, sum(price_cents) AS total_cents
             |   FROM orders_m GROUP BY o_orderstatus')""".stripMargin)
    // deltas the refresh must fold from the change feed alone
    s.sql(s"""INSERT INTO graft.$ns.orders_m
             |SELECT o_orderkey, o_orderstatus,
             |       CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin)
    s.sql(s"DELETE FROM graft.$ns.orders_m WHERE o_orderkey BETWEEN 3000 AND 3999")
    s.sql(s"CALL graft.system.refresh_matview('$ns', 'mv_status')")
    s.sql(s"""SELECT o_orderstatus, n, CAST(total_cents AS BIGINT) AS total_cents
             |FROM graft.$ns.mv_status ORDER BY o_orderstatus""".stripMargin)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("c39_sql_matview" -> c39SqlMatview _)

  val oracles: Map[String, String] = Map(
    // the same closed form as c09/st08: the matview maintained purely
    // from deltas must equal the from-scratch recompute of head state
    "c39_sql_matview" ->
      """WITH c AS (
        |  SELECT o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |  WHERE o_orderkey NOT BETWEEN 3000 AND 3999
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM c GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
}
