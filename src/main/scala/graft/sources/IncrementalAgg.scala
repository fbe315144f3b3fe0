package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a Snapshots
  * table — the consumer [[Snapshots.readChanges]] exists FOR: the
  * reference's cursor stream is "give me what changed since"
  * (Stream.hs:244-284), and the point of consuming changes is to keep
  * a derived result current WITHOUT recomputing it from the source.
  *
  * The aggregate (per-group count + sum) lives in its OWN Snapshots
  * lake as two tables committed atomically:
  *
  *  - `agg`: groupCol, n, total — the materialized result;
  *  - `watermark`: one row recording the SOURCE version the aggregate
  *    reflects (the consumer's cursor position).
  *
  * [[refresh]] diffs the source between the watermark and its head —
  * O(changed files), untouched files never enter the scan — folds the
  * signed deltas into the stored aggregate (added rows +1/+value,
  * removed rows −1/−value; an in-place update surfaces as remove+add
  * and nets to its value change), and publishes (new agg, new
  * watermark) in ONE atomic commit: a reader of the agg lake never
  * sees an aggregate without the cursor that explains it, and a
  * crashed refresh leaves the old pair intact for a clean re-run.
  * Count-zero groups are dropped so a group deleted from the source
  * disappears rather than lingering at n=0.
  *
  * Maintenance-safety: a compact/partial rewrite of the source shows
  * up as remove(old files) + add(new files); rows that merely moved
  * between files cancel group-wise, so the maintained aggregate is
  * invariant under source maintenance (TxnSpec drives append, delete,
  * update, and compact through refresh and checks against a
  * from-scratch recompute after each).
  *
  * At 100 TB this is the standing shape of every derived table the
  * reference's users build with cursor streams: refresh cost follows
  * the CHANGE rate, not the table size.
  */
object IncrementalAgg {

  private def aggregate(rows: DataFrame, groupCol: String, sumCol: String): DataFrame =
    rows.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(sumCol).as("total"))

  private def watermarkDf(s: SparkSession, v: Long): DataFrame = {
    import s.implicits._
    Seq(v).toDF("src_version")
  }

  /** Version the aggregate currently reflects (None = never seeded). */
  def watermark(agg: Snapshots): Option[Long] =
    agg.currentVersion.map(_ =>
      agg.read("watermark").head().getLong(0))

  /** Full compute of the aggregate at source version `atVersion` (the
    * one O(table) pass the pipeline ever pays), committed with its
    * watermark. */
  def seed(s: SparkSession, src: Snapshots, table: String,
           groupCol: String, sumCol: String, agg: Snapshots,
           atVersion: Long): Long =
    agg.commit(Map(
      "agg" -> aggregate(src.read(table, Some(atVersion)), groupCol, sumCol),
      "watermark" -> watermarkDf(s, atVersion)))

  /** Advance the aggregate from its watermark to the source head by
    * folding the version-diff deltas in. No-op (returns the agg lake's
    * current version) when already current. O(changed files + |agg|).
    */
  def refresh(s: SparkSession, src: Snapshots, table: String,
              groupCol: String, sumCol: String, agg: Snapshots): Long = {
    val srcHead = src.currentVersion.getOrElse(
      throw new IllegalStateException("source lake has no commits"))
    val wm = watermark(agg).getOrElse(
      throw new IllegalStateException("aggregate not seeded — call seed() first"))
    if (wm == srcHead) return agg.currentVersion.get
    val sign = when(col("_change") === "added", 1L).otherwise(-1L)
    val deltas = src.readChanges(table, wm, srcHead)
      .groupBy(groupCol)
      .agg(sum(sign).as("dn"), sum(sign * col(sumCol)).as("dtotal"))
    val folded = agg.read("agg").join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("dtotal"), lit(0L))).as("total"))
      .where(col("n") =!= 0L)
    agg.commit(Map(
      "agg" -> folded,
      "watermark" -> watermarkDf(s, srcHead)))
  }

  /** foreachBatch body for the STREAMING form of [[refresh]]: fold one
    * change-feed micro-batch's signed deltas into the materialized
    * aggregate, idempotently. The applied batch id is committed
    * ATOMICALLY with the aggregate (same manifest), so after a
    * checkpoint restart a replayed batch is recognized and skipped —
    * the standard foreachBatch exactly-once recipe, expressed through
    * the lake's own atomic commit instead of an external ledger.
    * Cost per batch = O(batch + |agg|), never O(source table).
    */
  def applyBatch(agg: Snapshots, groupCol: String, sumCol: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val applied = if (agg.currentVersion.isDefined)
      agg.read("applied").head().getLong(0) else -1L
    if (batchId <= applied || batch.isEmpty) return
    val sign = when(col("_change") === "added", 1L).otherwise(-1L)
    val deltas = batch.groupBy(groupCol)
      .agg(sum(sign).as("dn"), sum(sign * col(sumCol)).as("dtotal"))
    val folded = (if (agg.currentVersion.isDefined)
      agg.read("agg").join(deltas, Seq(groupCol), "full_outer")
        .select(col(groupCol),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("total"), lit(0L)) + coalesce(col("dtotal"), lit(0L))).as("total"))
    else deltas.select(col(groupCol), col("dn").as("n"), col("dtotal").as("total")))
      .where(col("n") =!= 0L)
    agg.commit(Map(
      "agg" -> folded,
      "applied" -> Seq(batchId).toDF("batch_id")))
  }

  /** `st08_stream_matview`: the two round-7 capstones COMPOSED — the
    * change-feed source (D12) streams the diff lake's commit history
    * one version per micro-batch, and [[applyBatch]] maintains the
    * per-status aggregate from nothing but those deltas. The final
    * materialized view must equal DuckDB's from-scratch recompute of
    * the lake's HEAD state: a dropped batch, double-applied replay, or
    * mis-signed pre-image anywhere in the source → fold → commit chain
    * flips n or total_cents. Hermetic per run (fresh agg lake +
    * checkpoint; the SOURCE is the shared c08 fixture), so every
    * invocation exercises real micro-batch planning, the fold, and the
    * atomic commit protocol — this is the production standing shape of
    * a streaming materialized view over the lake.
    */
  def st08StreamMatview(s: SparkSession, dir: String): DataFrame = {
    val src = SnapshotsKeys.stagedDiffLake(s, dir)
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/mv_st08$tag"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val agg = new Snapshots(s, root)
    val ckpt = java.nio.file.Files.createTempDirectory("mv_ckpt").toString
    val q = s.readStream
      .format(classOf[ChangeFeed].getName)
      .option("path", src.rootPath).option("table", "orders")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1") // one lake commit per fold, as live
      .load()
      .writeStream
      .foreachBatch(applyBatch(agg, "o_orderstatus", "price_cents") _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new IllegalStateException("st08 change-feed drain timed out")
    } finally q.stop()
    agg.read("agg")
      .select(col("o_orderstatus"), col("n"), col("total").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  /** `c09_incremental_agg`: the CDC loop CLOSED — seed the per-status
    * aggregate at the diff lake's version 1 (pre-append, pre-delete
    * state), then advance it to head purely from [[Snapshots.
    * readChanges]] deltas. The oracle recomputes the head-state
    * aggregate from scratch in DuckDB: if delta folding dropped,
    * double-counted, or mis-signed a single row, n or total_cents
    * flips. Hermetic per run (the agg lake is rebuilt; the SOURCE diff
    * lake is the shared c08 fixture), so every invocation exercises
    * the real seed+refresh path.
    */
  def c09IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val src = SnapshotsKeys.stagedDiffLake(s, dir)
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/inc_c09$tag"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val agg = new Snapshots(s, root)
    seed(s, src, "orders", "o_orderstatus", "price_cents", agg, atVersion = 1L)
    refresh(s, src, "orders", "o_orderstatus", "price_cents", agg)
    agg.read("agg")
      .select(col("o_orderstatus"), col("n"), col("total").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("c09_incremental_agg" -> c09IncrementalAgg _,
        "st08_stream_matview" -> st08StreamMatview _)

  val oracles: Map[String, String] = Map(
    // st08 maintains the same aggregate as c09, purely from the
    // streamed feed — one closed form pins batch refresh (c09), the
    // streaming fold (st08), and DuckDB to each other
    "st08_stream_matview" ->
      """WITH c AS (
        |  SELECT o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |  WHERE o_orderkey NOT BETWEEN 3000 AND 3999
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM c GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "c09_incremental_agg" ->
      """WITH c AS (
        |  SELECT o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |  WHERE o_orderkey NOT BETWEEN 3000 AND 3999
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM c GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
}
