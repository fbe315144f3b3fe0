package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .withColumn("ev_ts", timestamp_micros(expr("ts div 1000")))
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
      .parquet(s"$dir/events.parquet")
      .withColumn("ev_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ev_ts", "2 hours")
      .groupBy(window(col("ev_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total"))
  }

  case class Ev(user_id: Long, ts_ms: Long, value: Double)
  case class Session(user_id: Long, n_events: Long, sess_start: Long, sess_end: Long)

  /** D2: stateful per-user sessionization with mapGroupsWithState —
    * the custom-state path (analog of hand-rolled consumer state in the
    * reference's conduit sinks). Batch-tested in StreamingSpec; the same
    * function body serves a readStream pipeline.
    */
  def sessionizeStateful(s: SparkSession, dir: String, gapMs: Long = 1800000L): DataFrame = {
    import s.implicits._
    val evs = events(s, dir)
      .select(col("user_id"), col("ts_ms"), col("value")).as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
        val sorted = it.toSeq.sortBy(_.ts_ms)
        val out = scala.collection.mutable.ListBuffer.empty[Session]
        var start = -1L; var end = -1L; var n = 0L
        sorted.foreach { e =>
          if (start < 0) { start = e.ts_ms; end = e.ts_ms; n = 1 }
          else if (e.ts_ms - end > gapMs) {
            out += Session(uid, n, start, end)
            start = e.ts_ms; end = e.ts_ms; n = 1
          } else { end = e.ts_ms; n += 1 }
        }
        if (start >= 0) out += Session(uid, n, start, end)
        out.iterator
      }
      .toDF()
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("st01_stream_window" -> st01StreamWindow _)

  val oracles: Map[String, String] = Map(
    "st01_stream_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
        |  event_type, count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
}
