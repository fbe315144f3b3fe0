package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming sinks — the consumer end of the reference's streaming
  * surface (reference: Stream.hs:244-284 feeds a Conduit the caller
  * drains into their own store; Parallel.hs:17-33 decouples producer
  * and consumer).
  *
  * In Structured Streaming the consumer is a sink; foreachBatch is the
  * general-purpose one: each micro-batch arrives as a normal DataFrame
  * together with a monotonically increasing batchId that is STABLE
  * ACROSS RETRIES — overwriting a per-batch output location keyed by
  * that id makes the sink idempotent, which upgrades the pipeline to
  * effectively-exactly-once end to end (source offsets + idempotent
  * writes). StreamingSpec replays a checkpointed query and asserts no
  * duplicates.
  */
object Sinks {

  /** Idempotent partitioned parquet sink: out/batch_id=N per batch. */
  def parquetBatchSink(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()

  /** Transactional streaming sink: each micro-batch lands as an
    * O(batch) atomic [[graft.sources.Snapshots.append]] into a
    * Snapshots table — readers always resolve a consistent committed
    * version (never a half-written batch), the ingest history is
    * time-travelable, and the batchId tag makes replays no-ops, so the
    * pipeline is effectively exactly-once into the SAME lake the
    * engine's transactions, maintenance (compact/vacuum) and
    * stats-pruned reads operate on. Consumed tags persist as manifest
    * state (not directory names), so the no-op guarantee holds even
    * when compaction or a partial rewrite runs between a batch and its
    * replay — maintenance and streaming retries compose safely.
    */
  def snapshotBatchSink(df: DataFrame, root: String, table: String,
                        checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        new graft.sources.Snapshots(batch.sparkSession, root)
          .append(table, batch, Some(s"b$batchId")): Unit
      }
      .start()

  /** A simple enrichment stream over events (no aggregation, so the
    * sink sees append-mode rows): normalize ts, filter, project.
    */
  def enrichedEvents(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream.schema(schema)
      .parquet(s"$dir/events*.parquet")
      .transform(df => df.withColumn("ev_ts", graft.operators.evTs(df)))
      .where(col("value") > 0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ev_ts"), col("value"))
  }
}
