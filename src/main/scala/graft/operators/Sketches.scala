package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations — the 100 TB substitutes for
  * their exact counterparts (q10 COUNT DISTINCT, q23 percentile).
  *
  * Exact COUNT(DISTINCT) expands every row per distinct aggregate and
  * shuffles the expansion; exact percentile collects per-group value
  * buffers. The sketch forms shrink both to constant-size mergeable
  * state (HyperLogLog++ registers, a quantile summary), so the shuffle
  * carries O(groups) bytes regardless of input size. Accuracy is
  * bounded and checked in SketchSpec against the exact operators
  * (rows-only entries — sketch internals are engine-specific, so no
  * cross-engine SQL oracle can hash-match).
  */
object Sketches {

  /** q27: HLL++ distinct customers per priority (rsd 1%). */
  def q27ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.01).as("n_cust_approx"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** q28: quantile-summary percentiles (accuracy 1/10000). */
  def q28ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4).as("p50_approx"),
        round(expr("approx_percentile(l_extendedprice, 0.95, 10000)"), 4).as("p95_approx"))
      .orderBy("l_returnflag")

  /** q32: quantity-weighted average price per return flag through the
    * custom DECLARATIVE aggregate (functions/WeightedAvgAgg.scala) —
    * two unboxed buffer slots, map-side partial agg, whole-stage
    * codegen; DuckDB oracle is the closed form Σ(v·w)/Σw.
    */
  def q32WeightedAvg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.WeightedAvg.weighted_avg
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(weighted_avg(col("l_extendedprice"), col("l_quantity")), 2).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_approx_distinct" -> q27ApproxDistinct _,
    "q28_approx_percentile" -> q28ApproxPercentile _,
    "q32_weighted_avg" -> q32WeightedAvg _)

  /** q27/q28 are rows-only: sketch values are engine-specific;
    * SketchSpec bounds them against the exact q10/q23 results instead.
    */
  val oracles: Map[String, String] = Map(
    "q32_weighted_avg" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
