package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling / introspection — the stats queries every access
  * layer's users run before touching a new table (and the inputs a
  * pipeline's skew/salting decisions are made from).
  */
object Profiling {

  private val profiled = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** q33: exact column profile → long form, WITHOUT the multi-distinct
    * Expand (r13, guide §2 "shuffle fewer bytes"). The r12 form put all
    * three exact COUNT(DISTINCT)s in ONE aggregate, which Catalyst
    * plans as Expand (4 projections per row) keyed on (q, e, d, gid) —
    * so the PLAIN aggregates (count/min/max/avg) were computed per
    * distinct VALUE-TRIPLE (~600k groups at sf0.1) with 18 partial
    * buffers each riding the shuffle, then merged again. Now the plain
    * profile is one keyless scan-aggregate and each exact distinct is
    * its own two-phase hash aggregate (partial distinct on the single
    * value column — parquet is columnar, so the extra scans re-read
    * only the profiled columns), cross-joined back as 1-row frames.
    * Measured (probe, sf0.1, 3 runs): cpu 2.2-12.4 s (GC-heavy spread)
    * → 1.0-1.2 s tight, wall 2.3-2.8 → 1.0-1.3 s; rows bit-identical
    * (ProfilingSpec pins the equality against the Expand form). At
    * 100 TB the sketch twin q33_profile_approx remains the doctrine —
    * this keeps the exact oracle-checkable form linear-ish too.
    */
  def q33Profile(s: SparkSession, dir: String): DataFrame =
    q33ProfileNoExpand(s, dir)

  /** The r12 Expand form, kept as the equivalence reference for the
    * spec (and for plan-diff evidence).
    */
  private[graft] def q33ProfileExpand(s: SparkSession, dir: String): DataFrame = {
    val aggs = profiled.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        round(min(col(c)), 4).as(s"${c}__min"),
        round(max(col(c)), 4).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    val stackArgs = profiled.map(c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__min, ${c}__max, ${c}__avg").mkString(", ")
    t(s, dir, "lineitem")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${profiled.size}, $stackArgs) AS " +
        "(col_name, n, n_null, n_distinct, min_v, max_v, avg_v)")
      .orderBy("col_name")
  }

  private[graft] def q33ProfileNoExpand(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val plainAggs = profiled.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        round(min(col(c)), 4).as(s"${c}__min"),
        round(max(col(c)), 4).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    val plain = li.agg(plainAggs.head, plainAggs.tail: _*)
    val withNd = profiled.foldLeft(plain) { (acc, c) =>
      acc.crossJoin(broadcast(li.agg(countDistinct(col(c)).as(s"${c}__nd"))))
    }
    val stackArgs = profiled.map(c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__min, ${c}__max, ${c}__avg").mkString(", ")
    withNd.selectExpr(s"stack(${profiled.size}, $stackArgs) AS " +
        "(col_name, n, n_null, n_distinct, min_v, max_v, avg_v)")
      .orderBy("col_name")
  }

  /** `q33_profile_approx`: the 100-TB profile — q33 with the exact
    * COUNT(DISTINCT)s swapped for approx_count_distinct (HLL++, q27's
    * sketch path). This REMOVES the Expand entirely: no per-distinct
    * projection multiplication, no distinct-value shuffle — one scan,
    * one partial-aggregate buffer per task per column, a constant-size
    * merge. The soak's q33 ratio (18x task time at 10x data — the
    * Expand's superlinearity) is the documented reason this twin
    * exists; SketchSpec gates the estimates against the exact key
    * within HLL++'s rsd bound so the doctrine is executable, not a
    * comment. Rows-only (the estimate is engine-specific — DuckDB's
    * approx_count_distinct uses a different sketch).
    */
  def q33ProfileApprox(s: SparkSession, dir: String, rsd: Double = 0.02): DataFrame = {
    val aggs = profiled.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
        round(min(col(c)), 4).as(s"${c}__min"),
        round(max(col(c)), 4).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    val stackArgs = profiled.map(c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__nd, ${c}__min, ${c}__max, ${c}__avg").mkString(", ")
    t(s, dir, "lineitem")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${profiled.size}, $stackArgs) AS " +
        "(col_name, n, n_null, n_distinct, min_v, max_v, avg_v)")
      .orderBy("col_name")
  }

  /** q34: equal-width histogram of l_extendedprice (10 buckets over
    * the observed [min, max]). The bounds come from a first aggregate
    * broadcast as a 1-row cross join — two scans total, no shuffle of
    * the fact rows beyond the bucket groupBy.
    */
  def q34Histogram(s: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
    val bounds = li.agg(min("x").as("lo"), max("x").as("hi"))
    li.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        // degenerate range (all values equal): everything in bucket 0
        // instead of a divide-by-zero NULL/Infinity bucket
        when(col("hi") === col("lo"), 0L)
          .otherwise(least(lit(buckets - 1),
            floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / buckets)))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(sum("x"), 2).as("total"))
      .orderBy("bucket")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_profile" -> q33Profile _,
    "q33_profile_approx" -> ((s, dir) => q33ProfileApprox(s, dir)),
    "q34_histogram" -> ((s, dir) => q34Histogram(s, dir)))

  val oracles: Map[String, String] = Map(
    "q33_profile" -> {
      val selects = profiled.map { c =>
        s"""SELECT '$c' AS col_name, count($c) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  round(min($c), 4) AS min_v, round(max($c), 4) AS max_v,
           |  round(avg($c), 4) AS avg_v
           |FROM lineitem""".stripMargin
      }
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q34_histogram" ->
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
        |)
        |SELECT CAST(least(9, floor((l_extendedprice - lo) / ((hi - lo) / 10))) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem, b
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
