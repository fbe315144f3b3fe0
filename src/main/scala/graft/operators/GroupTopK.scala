package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.TopK

/** B25 `q29_topk_group`: top-k rows per group through the custom
  * TopKPerGroup operator (plans/TopKPerGroup.scala) — one hash shuffle
  * + bounded heaps, versus the window formulation's full per-group
  * sort. The oracle is the equivalent QUALIFY row_number query, so the
  * custom operator's semantics are pinned to the standard SQL meaning.
  */
object GroupTopK {

  def q29TopkGroup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey").cast("long").as("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
    TopK.perGroup(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q29_topk_group" -> q29TopkGroup _)

  val oracles: Map[String, String] = Map(
    "q29_topk_group" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, l_orderkey,
        |    CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |) WHERE rn <= 3
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin)
}
