package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** The reference's north-star pipeline, end to end: a database change
  * table → incremental poll → MERGE into lake state. pgstream's users
  * run exactly this loop (stream Postgres changes into a compute
  * pipeline; reference: README.md:10-14, Stream.hs:244-284); the
  * engine-side composition is:
  *
  *   [[Jdbc.readQuery]] (only rows past the watermark cross the wire)
  *     → decoded change batch
  *     → [[LakeMerge.mergeBatch]] (bucket-pruned upsert, idempotent)
  *
  * The watermark (max change ts applied so far) is the resume token:
  * polling is at-least-once, and because the merge is replay-idempotent
  * the composed pipeline is effectively exactly-once — the same
  * contract as the foreachBatch path, with the poll taking the place
  * of micro-batch scheduling for sources Spark cannot stream natively.
  * JdbcSpec drives the whole loop against embedded Derby.
  */
object JdbcCdc {

  /** One poll-and-merge step: read changes with ts > `sinceTs` from
    * `changeTable` (schema: OP, TS_MS, O_ORDERKEY, O_TOTALPRICE),
    * merge them into the state lake at `statePath`, and return the new
    * watermark (`sinceTs` if the poll was empty). The watermark query
    * runs ON the database — an empty poll costs one scalar round trip.
    */
  def ingestOnce(s: SparkSession, cs: Jdbc.ConnSettings, changeTable: String,
                 statePath: String, sinceTs: Long): Long = {
    val hi = Jdbc.readQuery(s,
      cs, s"SELECT MAX(TS_MS) AS HI FROM $changeTable WHERE TS_MS > $sinceTs")
      .head().getAs[Number](0)
    if (hi == null) return sinceTs
    val batch = Jdbc.readQuery(s, cs,
      s"SELECT OP, TS_MS, O_ORDERKEY, O_TOTALPRICE FROM $changeTable " +
        s"WHERE TS_MS > $sinceTs AND TS_MS <= ${hi.longValue()}")
      .select(
        col("OP").as("op"), col("TS_MS").as("ts_ms"),
        col("O_ORDERKEY").as("o_orderkey"), col("O_TOTALPRICE").as("o_totalprice"))
    LakeMerge.mergeBatch(s, statePath, batch)
    hi.longValue()
  }
}
