package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join: points ⋈ intervals on key equality plus
  * `start <= pointTs < end` — the query shape behind the reference's
  * `BETWEEN`-heavy SQL (reference: Example.hs:30-36
  * `currentprice.val BETWEEN 0 AND 500`, `deltas.day BETWEEN …`).
  *
  * Spark-first design: a raw inequality join degenerates to a broadcast
  * nested-loop / cartesian at scale. We bin both sides by a fixed time
  * bucket: points land in one bin, each interval explodes into the bins
  * it covers (≤ ceil(len/bin)+1), and the join becomes an EQUI-join on
  * (key, bin) with a residual range filter. Candidate pairs are bounded
  * by true matches per bin — linear shuffle, AQE-skew-splittable, no
  * cross product at 100 TB.
  */
object RangeJoin {

  /** Equi-key binned interval join. `intervals` must carry `startCol`
    * (inclusive) and `endCol` (exclusive) as epoch-ms longs; `points`
    * carries `pointTs` epoch-ms.
    */
  def binnedIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      pointTs: String,
      startCol: String,
      endCol: String,
      binMs: Long): DataFrame = {
    val p = points.withColumn("__bin", expr(s"$pointTs div $binMs"))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(expr(s"$startCol div $binMs"), expr(s"($endCol - 1) div $binMs"))))
    p.join(i,
      p(pointKey) === i(intervalKey) && p("__bin") === i("__bin") &&
        p(pointTs) >= i(startCol) && p(pointTs) < i(endCol))
      .drop("__bin")
  }

  /** B18 `q22_range_join`: for every purchase, aggregate the user's
    * 'view' events in the preceding hour. Window length == bin length,
    * so each interval covers at most 2 bins.
    */
  def q22Range(s: SparkSession, dir: String): DataFrame = {
    val hourMs = 3600000L
    val e = events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_ms").as("v_ts"), col("value").as("v_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        (col("ts_ms") - hourMs).as("win_start"), col("ts_ms").as("win_end"))

    binnedIntervalJoin(
      points = views, intervals = purchases,
      pointKey = "v_user", intervalKey = "p_user", pointTs = "v_ts",
      startCol = "win_start", endCol = "win_end", binMs = hourMs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_views"), round(sum("v_value"), 2).as("views_value"))
      .orderBy("purchase_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q22_range_join" -> q22Range _)

  val oracles: Map[String, String] = Map(
    "q22_range_join" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_views,
        |  round(sum(v.value),2) AS views_value
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id
        | AND epoch_ms(v.ts) >= epoch_ms(p.ts) - 3600000
        | AND epoch_ms(v.ts) < epoch_ms(p.ts)
        |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
