package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned lake layout — the second physical-layout tool
  * next to bucketing: `partitionBy(col)` writes one directory per
  * value, and a filter on the partition column prunes entire
  * directories at PLANNING time (`PartitionFilters` on the scan, no IO
  * at all for pruned values). At 100 TB this is the difference between
  * scanning one event type and scanning the firehose.
  */
object PartitionedLake {

  /** Stage events partitioned by event_type (idempotent per dir). */
  def ensureEventsByType(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/events_by_type$tag"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      s.read.parquet(s"$dir/events.parquet")
        .write.partitionBy("event_type").parquet(path)
    path
  }

  /** q30: aggregate two event types from the partitioned layout — the
    * scan lists only the matching partition directories (PlanSpec
    * asserts the PartitionFilters). Oracle runs the same aggregate on
    * the unpartitioned source.
    */
  def q30PartitionPruned(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureEventsByType(s, dir))
      .where(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type")

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q30_partition_pruned" -> q30PartitionPruned _)

  val oracles: Map[String, String] = Map(
    "q30_partition_pruned" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS total
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
