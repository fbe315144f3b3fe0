package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.events

/** Structured Streaming analogs of the reference's streaming surface:
  * `stream` (cursor batches, reference: Stream.hs:244-277) and
  * `parallelStream` (producer/consumer channel, reference:
  * Parallel.hs:17-33). In Spark the producer/consumer decoupling and
  * back-pressure are owned by the engine (micro-batches over a
  * replayable source); what we define is the declarative transform.
  */
object EventStreams {

  /** D1 batch twin of the windowed stream: tumbling 1-hour aggregation.
    * Identical logic runs under `readStream` (see [[windowedStream]]);
    * this batch form is what the DuckDB oracle checks.
    */
  def st01StreamWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .transform(df => df.withColumn("ev_ts", graft.operators.evTs(df)))
      .groupBy(window(col("ev_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start_ms", "event_type")

  /** The same aggregation as a genuine streaming query over the events
    * parquet, with a watermark bounding state. Used by StreamingSpec
    * (memory sink + processAllAvailable).
    */
  def windowedStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream
      .schema(schema)
      // glob, not the bare file path: FileStreamSource requires its
      // basePath to be a directory (the glob's parent qualifies).
      .parquet(s"$dir/events*.parquet")
      .transform(df => df.withColumn("ev_ts", graft.operators.evTs(df)))
      .withWatermark("ev_ts", "2 hours")
      .groupBy(window(col("ev_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total"))
  }

  /** D11 `st06_session_window` batch twin: per-user sessionization via
    * the engine's NATIVE session_window operator — the third session
    * formulation next to q19 (manual gaps-and-islands windows) and the
    * flatMapGroupsWithState sessionizer (D2). session_window is a
    * MERGING window: each event opens [ts, ts+gap) and overlapping-or-
    * touching windows coalesce, so an event exactly `gap` after its
    * predecessor MERGES into the same session — a new session requires
    * a strictly GREATER gap, which is what the oracle's
    * `ts - lag(ts) > gap` boundary encodes (verified by the streaming
    * equality test). Timestamps are truncated to millis BEFORE
    * windowing so both engines do the gap arithmetic on identical
    * values.
    */
  def st06SessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("ev_ts", timestamp_millis(col("ts_ms")))
      .groupBy(session_window(col("ev_ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sess_value"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("sess_start_ms"),
        unix_millis(col("sw.end")).as("sess_end_ms"),
        col("n_events"), col("sess_value"))
      .orderBy("user_id", "sess_start_ms")

  /** The genuinely-streaming session twin: watermarked event-time
    * sessions whose state store MERGES windows across micro-batches and
    * evicts sessions the watermark has passed — bounded state on an
    * unbounded stream, the property the D2 custom sessionizer provides
    * by hand and session_window gives natively.
    */
  def sessionWindowStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
      .transform(df => df.withColumn("ev_ts", graft.operators.evTsMs(df)))
      .withWatermark("ev_ts", "2 hours")
      .groupBy(session_window(col("ev_ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sess_value"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("sess_start_ms"),
        unix_millis(col("sw.end")).as("sess_end_ms"),
        col("n_events"), col("sess_value"))
  }

  /** A4b `st02_stream_join` batch twin: view→purchase correlation —
    * same user, purchase within 30 minutes of the view. An equi-join on
    * user_id with a range residual, so the plan is a hash join, not an
    * interval cross product. The genuinely-streaming form is
    * [[correlatedStream]] (StreamingSpec proves they agree).
    */
  def st02StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select("event_id", "user_id", "event_type", "ts_ms")
    val v = e.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_ms").as("v_ts"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts_ms").as("p_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") && col("p_ts") <= col("v_ts") + 1800000L)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("p_ts") - col("v_ts")).as("lag_ms"))
      .orderBy("user_id", "view_id", "purchase_id")
  }

  /** Watermarked stream-stream inner join: both sides carry a 1-hour
    * watermark and the join condition bounds purchase time to
    * [view, view+30min], so the state store can evict view rows past
    * the watermark — bounded state, the requirement for an unbounded
    * 100 TB/day stream. (Inner time-interval join is the canonical
    * Structured Streaming stream-stream join shape.)
    */
  def correlatedStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def side(tp: String): DataFrame =
      s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
        .transform(df => df.withColumn("ev_ts", graft.operators.evTs(df)))
        .where(col("event_type") === tp)
        .withWatermark("ev_ts", "1 hour")
    val v = side("view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ev_ts").as("v_ts"))
    val p = side("purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ev_ts").as("p_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("lag_ms"))
  }

  /** D9 st05 batch twin: the LEFT OUTER view→purchase correlation —
    * views with no purchase inside the window survive with a null match
    * (surfaced as -1 so every crossing column stays BIGINT). Outer
    * stream-stream is semantically distinct from inner (st02): the
    * engine must DECIDE a view is unmatched, which only the watermark
    * can prove.
    */
  def st05StreamOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select("event_id", "user_id", "event_type", "ts_ms")
    val v = e.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_ms").as("v_ts"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts_ms").as("p_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") && col("p_ts") <= col("v_ts") + 1800000L, "left_outer")
      .select(col("user_id"), col("view_id"), col("v_ts"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("p_ts") - col("v_ts"), lit(-1L)).as("lag_ms"))
      .orderBy("user_id", "view_id", "purchase_id")
  }

  /** The genuinely-streaming LEFT OUTER twin: both sides watermarked,
    * join time-bounded, so the state store can both evict AND emit
    * null-matches — an unmatched view row is released exactly when the
    * watermark passes view_ts + 30min (before that the match could
    * still arrive; this is why outer stream joins REQUIRE the
    * watermark + time bound, not just benefit from them). Views newer
    * than (max event time − watermark − bound) are still pending when
    * the source drains — StreamingSpec asserts set containment both
    * ways with exactly that cutoff.
    */
  def outerCorrelatedStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def side(tp: String): DataFrame =
      s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
        .transform(df => df.withColumn("ev_ts", graft.operators.evTs(df)))
        .where(col("event_type") === tp)
        .withWatermark("ev_ts", "1 hour")
    val v = side("view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ev_ts").as("v_ts"))
    val p = side("purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ev_ts").as("p_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"), "left_outer")
      .select(col("user_id"), col("view_id"), unix_millis(col("v_ts")).as("v_ts"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(unix_millis(col("p_ts")) - unix_millis(col("v_ts")), lit(-1L)).as("lag_ms"))
  }

  /** Per-user profile table (lifetime value, event count) staged to
    * parquet once per sf dir — the static dimension side of the
    * stream-static join (stands in for a users/accounts table).
    */
  def userDim(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/user_dim$tag"
    graft.StagedFixture.ensure(s, path, "G1") {
      events(s, dir).groupBy("user_id")
        .agg(round(sum("value"), 2).as("lifetime_value"),
          count(lit(1)).as("n_events_total"))
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  /** D8 st04 batch twin: dimension enrichment + rollup. The streaming
    * form is [[enrichedByDimStream]]; this is what the oracle checks.
    */
  def st04StreamEnrich(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .join(broadcast(userDim(s, dir)), Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("lifetime_value")), 2).as("weighted_total"))
      .orderBy("event_type")

  /** The genuinely-streaming twin: a STREAM-STATIC join — the static
    * dimension is a plain batch DataFrame, broadcast fresh into each
    * micro-batch (no state store, no watermark needed on the dim side;
    * this is the third join shape next to stream-stream st02 and the
    * batch joins). StreamingSpec proves equality with the batch twin.
    */
  def enrichedByDimStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
      .join(broadcast(userDim(s, dir)), Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("lifetime_value")), 2).as("weighted_total"))
  }

  /** D6 st03 batch twin: exact dedup of duplicated delivery. The input
    * is the event stream unioned with itself (at-least-once delivery
    * always re-sends SOMETHING — a dedup test over an already-unique
    * stream is vacuous); dropDuplicates on the event id must collapse
    * every copy before the rollup. The oracle is the closed form (the
    * rollup over the original events).
    */
  def st03StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select("event_id", "event_type", "value")
    e.union(e)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type")
  }

  /** One delivered event (possibly re-delivered) for the streaming
    * dedup path.
    */
  case class DeliveredEv(event_id: Long, ts_ms: Long, value: Double)

  /** The genuinely-streaming dedup twin: dropDuplicatesWithinWatermark
    * keeps per-key state only until the watermark passes — bounded
    * state on an unbounded stream, which plain dropDuplicates (state
    * grows forever) cannot give. Duplicates arriving within the
    * watermark horizon are suppressed across micro-batches
    * (StreamingSpec proves it through MemoryStream).
    */
  def dedupeDelivery(evs: Dataset[DeliveredEv]): DataFrame =
    evs.withColumn("ev_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ev_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  case class Ev(user_id: Long, ts_ms: Long, value: Double)
  case class Session(user_id: Long, n_events: Long, sess_start: Long, sess_end: Long)
  /** Open-session state carried between micro-batches. */
  case class OpenSess(start: Long, end: Long, n: Long)

  /** D2: stateful per-user sessionization with flatMapGroupsWithState —
    * the custom-state path (analog of hand-rolled consumer state in the
    * reference's conduit sinks, Parallel.hs:17-33). Works on a streaming
    * Dataset (state survives micro-batches; closed sessions are emitted
    * as they close) and on a batch Dataset (single invocation, empty
    * initial state) — StreamingSpec drives both.
    *
    * Memory bound: the per-call sort materializes one user's events
    * *from one micro-batch* (bounded by the trigger interval), never the
    * user's full history — history lives in the O(1) OpenSess state.
    * For whole-history batch sessionization use the declarative
    * gaps-and-islands form (q19, Relational.q19Sessionize), which
    * sorts within shuffle partitions instead.
    */
  def sessionize(evs: Dataset[Ev], gapMs: Long = 1800000L): Dataset[Session] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSess, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSess]) =>
          // One micro-batch of one user's events: sort is batch-bounded.
          val batch = it.toArray.sortBy(e => (e.ts_ms, e.user_id))
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var cur = state.getOption.orNull
          batch.foreach { e =>
            if (cur == null) cur = OpenSess(e.ts_ms, e.ts_ms, 1)
            else if (e.ts_ms - cur.end > gapMs) {
              out += Session(uid, cur.n, cur.start, cur.end)
              cur = OpenSess(e.ts_ms, e.ts_ms, 1)
            } else
              // min/max, not overwrite: an event LATE across micro-batch
              // boundaries (no watermark guards this path) that merges
              // into the open session must never drag its end backwards
              // — a regressed end makes the next on-time event open a
              // spurious new session
              cur = OpenSess(math.min(cur.start, e.ts_ms),
                math.max(cur.end, e.ts_ms), cur.n + 1)
          }
          if (cur != null) state.update(cur) else state.remove()
          out.iterator
      }
  }

  /** Batch entry point for [[sessionize]] over the events table (the
    * still-open session per user is flushed by a final gap event, so
    * batch output covers every event).
    */
  def sessionizeStateful(s: SparkSession, dir: String, gapMs: Long = 1800000L): DataFrame = {
    import s.implicits._
    val evs = events(s, dir)
      .select(col("user_id"), col("ts_ms"), col("value")).as[Ev]
    // Flush sentinel: one far-future event per user closes its last open
    // session; the sentinel's own session (n=1 at Long.MaxValue/2) is
    // dropped by the sess_start filter.
    val sentinel = evs.groupByKey(_.user_id).mapGroups((uid, _) =>
      Ev(uid, Long.MaxValue / 2, 0.0))
    sessionize(evs.union(sentinel), gapMs)
      .filter(col("sess_start") < Long.MaxValue / 2)
      .toDF()
  }

  case class TEv(event_type: String, event_id: Long, value: Double)
  case class TopState(ver: Long, values: List[Double], ids: List[Long])
  case class TopEmit(event_type: String, ver: Long, rank: Long, event_id: Long, value: Double)

  /** D16 `st10_stream_topk`: STREAMING per-group top-k — a standing
    * leaderboard ("top events by value per type") maintained
    * incrementally. This is the streaming twin of the B25 bounded-heap
    * operator (plans/TopKPerGroup): state is O(k) per group — the
    * current top-k list, never the history — and each micro-batch folds
    * its rows into the heap and re-emits the group's current top-k in
    * Update mode tagged with a per-group version (consumers take the
    * max-ver emission; a group untouched by a batch emits nothing).
    * Order is pinned (value desc, event_id asc) so ties can't make the
    * board nondeterministic. Runs unchanged on a batch Dataset (single
    * invocation per group = the final board), which is what the DuckDB
    * oracle checks.
    */
  def streamingTopK(evs: Dataset[TEv], k: Int = 5): Dataset[TopEmit] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.event_type)
      .flatMapGroupsWithState[TopState, TopEmit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (typ: String, it: Iterator[TEv], state: GroupState[TopState]) =>
          val prev = state.getOption.getOrElse(TopState(0L, Nil, Nil))
          // fold the batch into the bounded board: merge + resort is
          // O((k + batch) log(k + batch)) per group per batch — batch
          // rows are the micro-batch's, never the stream's history
          val merged = (prev.values.zip(prev.ids).iterator ++ it.map(e => (e.value, e.event_id)))
            .toArray.sortBy { case (v, id) => (-v, id) }.take(k)
          val next = TopState(prev.ver + 1L, merged.map(_._1).toList, merged.map(_._2).toList)
          state.update(next)
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            TopEmit(typ, next.ver, i + 1L, id, v)
          }
      }
  }

  /** Batch twin of [[streamingTopK]] — the oracle-checked form. */
  def st10StreamTopk(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val evs = events(s, dir)
      .select(col("event_type"), col("event_id"), col("value")).as[TEv]
    streamingTopK(evs, k)
      .select(col("event_type"), col("rank"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy("event_type", "rank")
  }

  /** The genuinely-streaming form over the events parquet (StreamingSpec
    * proves its final board equals the batch twin).
    */
  def topkStream(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val evs = s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
      .select(col("event_type"), col("event_id"), col("value")).as[TEv]
    streamingTopK(evs, k).toDF()
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("st01_stream_window" -> st01StreamWindow _,
      "st10_stream_topk" -> ((s, dir) => st10StreamTopk(s, dir)),
      "st02_stream_join" -> st02StreamJoin _,
      "st03_stream_dedup" -> st03StreamDedup _,
      "st04_stream_enrich" -> st04StreamEnrich _,
      "st05_stream_outer_join" -> st05StreamOuterJoin _,
      "st06_session_window" -> st06SessionWindow _)

  val oracles: Map[String, String] = Map(
    "st10_stream_topk" ->
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rank
        |  FROM events
        |)
        |SELECT event_type, rank, event_id, round(value, 2) AS value
        |FROM r WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    "st06_session_window" ->
      """WITH e AS (
        |  SELECT user_id, value, epoch_ms(ts) AS ts_ms FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
        |      OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
        |), sess AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, min(ts_ms) AS sess_start_ms,
        |  max(ts_ms) + 1800000 AS sess_end_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS sess_value
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, sess_start_ms""".stripMargin,
    "st01_stream_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
        |  event_type, count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "st02_stream_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
        |)
        |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        |  p.ts_ms - v.ts_ms AS lag_ms
        |FROM e v JOIN e p ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts_ms >= v.ts_ms AND p.ts_ms <= v.ts_ms + 1800000
        |ORDER BY 1, 2, 3""".stripMargin,
    "st03_stream_dedup" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "st05_stream_outer_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
        |)
        |SELECT v.user_id, v.event_id AS view_id, v.ts_ms AS v_ts,
        |  coalesce(p.event_id, -1) AS purchase_id,
        |  coalesce(p.ts_ms - v.ts_ms, -1) AS lag_ms
        |FROM e v LEFT JOIN e p ON v.user_id = p.user_id
        |  AND p.event_type = 'purchase'
        |  AND p.ts_ms >= v.ts_ms AND p.ts_ms <= v.ts_ms + 1800000
        |WHERE v.event_type = 'view'
        |ORDER BY 1, 2, 4""".stripMargin,
    "st04_stream_enrich" ->
      """WITH dim AS (
        |  SELECT user_id, round(sum(value), 2) AS lifetime_value
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type, count(*) AS n,
        |  round(sum(e.value * dim.lifetime_value), 2) AS weighted_total
        |FROM events e JOIN dim USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
