package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object operators {

  /** Load one named table from the scale-factor directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with a normalized epoch-millisecond `ts_ms` column.
    *
    * events.ts is nanosecond parquet (read as Long via
    * spark.sql.legacy.parquet.nanosAsLong); DuckDB truncates ns→µs on
    * read and epoch_ms() truncates µs→ms, so integer `div` (never
    * double division — ns magnitudes exceed double's exact range)
    * matches the oracle bit-for-bit for post-1970 data.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    // If the session read ns-as-long, ts is LongType; otherwise timestamp.
    val tsCol = e.schema("ts").dataType.typeName match {
      case "long" => expr("ts div 1000000")
      case _      => unix_millis(col("ts").cast("timestamp"))
    }
    e.withColumn("ts_ms", tsCol)
  }

  /** Epoch seconds of a (NTZ) timestamp column under the UTC session. */
  def epochS(c: Column): Column = unix_timestamp(c.cast("timestamp"))

  /** events.ts as a proper event-time TIMESTAMP column, schema-aware
    * like [[events]]: long-ns data (legacy nanosAsLong read) truncates
    * ns→µs; native timestamp data casts (NTZ → session-UTC) untouched.
    * Works on batch and readStream DataFrames alike — the streaming
    * twins must window on exactly the values their batch oracles see.
    */
  def evTs(df: DataFrame): Column = df.schema("ts").dataType.typeName match {
    case "long" => timestamp_micros(expr("ts div 1000"))
    case _      => col("ts").cast("timestamp")
  }

  /** [[evTs]] truncated to MILLISECONDS — session-window gap arithmetic
    * must run on identical values in both engines, so both truncate to
    * the coarser unit first.
    */
  def evTsMs(df: DataFrame): Column = df.schema("ts").dataType.typeName match {
    case "long" => timestamp_millis(expr("ts div 1000000"))
    case _      => timestamp_millis(unix_millis(col("ts").cast("timestamp")))
  }
}
