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

    // NULL join keys never match under SQL equality, but
    // Window.partitionBy groups NULLs into one partition — an
    // unfiltered right side would attach payloads to NULL-keyed left
    // rows (phantom matches an ASOF JOIN oracle forbids). Filtering
    // the right side is sufficient: a NULL-keyed left row's partition
    // then holds only left rows and last(__r, ignoreNulls) stays null.
    val r = right.where(col(key).isNotNull).select(
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

  /** FORWARD as-of left join with tolerance — pandas
    * `merge_asof(direction='forward', tolerance=…)` semantics: for each
    * left row, the EARLIEST right row at-or-after `leftTs` per key;
    * when `toleranceMs` is set, a nearest match farther than the
    * tolerance yields NULLs (the row itself survives — LEFT semantics).
    * Implementation: the [[leftAsOf]] sort-merge machinery run on
    * NEGATED time (forward is backward's mirror), so the same one
    * shuffle + one sort per side, linear at any scale; the tolerance
    * masks AFTER the match (nearest-beyond-tolerance ⟺ nothing within
    * tolerance, so masking the nearest is exact). Same tie rule:
    * among right rows with equal (key, ts) the greatest tie-break wins.
    */
  def forwardAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = (rightPayload :+ rightTs).distinct
    val joined = leftAsOf(
      left.withColumn("__nlt", -col(leftTs).cast("long")),
      right.withColumn("__nrt", -col(rightTs).cast("long")),
      key, "__nlt", "__nrt", payload, rightTieBreak)
    val masked = toleranceMs match {
      case None => joined
      case Some(tol) =>
        val inTol = col(s"asof_$rightTs").isNotNull &&
          (col(s"asof_$rightTs").cast("long") - col(leftTs).cast("long")) <= tol
        payload.foldLeft(joined) { (df, c) =>
          df.withColumn(s"asof_$c", when(inTol, col(s"asof_$c"))) }
    }
    masked.select(leftCols.filter(_ != "__nlt").map(col) ++
      rightPayload.map(c => col(s"asof_$c")): _*)
  }

  /** B55 `q60_asof_forward`: for every view event, the user's NEXT
    * purchase at-or-after the view, within a 2-hour tolerance —
    * the conversion-attribution query (q21's mirror). Purchases are
    * deduplicated per (user_id, ts) with the greatest event_id kept,
    * matching the tie rule, so the DuckDB forward ASOF oracle is
    * deterministic.
    */
  def q60AsOfForward(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val dedupW = Window.partitionBy("user_id", "ts_ms").orderBy(col("event_id").desc)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts_ms", "value", "event_id")
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts_ms").as("view_ts"))
    forwardAsOf(views, purchases,
      key = "user_id", leftTs = "view_ts", rightTs = "ts_ms",
      rightPayload = Seq("ts_ms", "value"), rightTieBreak = "event_id",
      toleranceMs = Some(7200000L))
      .select(col("view_id"), col("user_id"), col("view_ts"),
        col("asof_ts_ms").as("next_purchase_ts"),
        col("asof_value").as("next_purchase_value"))
      .orderBy("view_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q21_asof_join" -> q21AsOf _,
        "q60_asof_forward" -> q60AsOfForward _)

  val oracles: Map[String, String] = Map(
    "q60_asof_forward" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id FROM events
        |  WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, epoch_ms(ts)
        |    ORDER BY event_id DESC) = 1
        |), v AS (
        |  SELECT event_id AS view_id, user_id, epoch_ms(ts) AS view_ts
        |  FROM events WHERE event_type = 'view'
        |), m AS (
        |  SELECT v.view_id, v.user_id, v.view_ts, p.ts_ms, p.value
        |  FROM v ASOF LEFT JOIN p
        |    ON v.user_id = p.user_id AND v.view_ts <= p.ts_ms
        |)
        |SELECT view_id, user_id, view_ts,
        |  CASE WHEN ts_ms - view_ts <= 7200000 THEN ts_ms END AS next_purchase_ts,
        |  CASE WHEN ts_ms - view_ts <= 7200000 THEN value END AS next_purchase_value
        |FROM m ORDER BY view_id""".stripMargin,
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
