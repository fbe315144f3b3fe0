package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** AS-OF join: for each left row, attach the latest right row whose
  * timestamp is <= the left row's timestamp, per key — the point-in-time
  * lookup a pgstream user writes with a correlated subquery / DISTINCT ON
  * over time-series tables (reference: Example.hs:22-40 is exactly such a
  * prices-as-of-day query shape).
  *
  * Spark-first design: Spark has no ASOF join operator, and a naive
  * translation (inequality theta-join + max) explodes to O(n·m) pairs.
  * Instead we union-tag both sides, do ONE shuffle+sort on
  * (key, time, side) and take a running `last(payload, ignoreNulls)` —
  * a sort-merge formulation that is linear in input size and scales to
  * arbitrarily large sides (no broadcast, no cross product). At 100 TB
  * both sides shuffle exactly once on the join key.
  */
object AsOfJoin {

  /** Generic as-of left join.
    *
    * @param left      point-in-time probe side
    * @param right     time-series build side
    * @param key       equi-join key column name (present in both)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightPayload right columns to attach (others dropped)
    * @param rightTieBreak right column that makes (key, ts) unique wins:
    *                  among right rows with equal (key, ts) the greatest
    *                  tie-break value is matched (deterministic).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct.as("p")).schema("p").dataType
    val leftType = left.select(struct(leftCols.map(col): _*).as("l")).schema("l").dataType

    val r = right.select(
      col(key).as("__k"), col(rightTs).cast("long").as("__t"),
      lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tb"),
      payloadStruct.as("__r"))
      .withColumn("__l", lit(null).cast(leftType))

    val l = left.select(
      col(key).as("__k"), col(leftTs).cast("long").as("__t"),
      lit(1).as("__side"), lit(Long.MaxValue).as("__tb"),
      lit(null).cast(payloadType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))

    // right rows sort before left rows at equal time (side 0 < 1), so a
    // right row at exactly leftTs matches (<= semantics); among equal
    // (key, t) right rows the greatest tie-break sorts last and wins.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__match", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }

  /** B17 `q21_asof_join`: for every purchase event, the user's latest
    * 'view' event at-or-before the purchase. Views are deduplicated per
    * (user_id, ts_ms) first so the DuckDB ASOF JOIN oracle is
    * deterministic.
    */
  def q21AsOf(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val dedupW = Window.partitionBy("user_id", "ts_ms").orderBy(col("event_id").desc)
    val views = e.filter(col("event_type") === "view")
      .select("user_id", "ts_ms", "value", "event_id")
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_ms").as("purchase_ts"))

    leftAsOf(purchases, views,
      key = "user_id", leftTs = "purchase_ts", rightTs = "ts_ms",
      rightPayload = Seq("ts_ms", "value"), rightTieBreak = "event_id")
      .select(
        col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("asof_ts_ms").as("matched_ts"), col("asof_value").as("matched_value"))
      .orderBy("purchase_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q21_asof_join" -> q21AsOf _)

  val oracles: Map[String, String] = Map(
    "q21_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id FROM events
        |  WHERE event_type = 'view'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, epoch_ms(ts)
        |    ORDER BY event_id DESC) = 1
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |  v.ts_ms AS matched_ts, v.value AS matched_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts_ms <= p.purchase_ts
        |ORDER BY purchase_id""".stripMargin)
}
