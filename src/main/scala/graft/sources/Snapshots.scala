package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated multi-table commits — the transactions analog
  * (reference: Stream.hs:166-231 `withTransaction`/isolation levels).
  * A pgstream user wraps multi-table writes in BEGIN/COMMIT; the lake
  * engine's equivalent is a commit LOG: data files are written first
  * (invisible), then ONE manifest file covering every table in the
  * commit is published with an atomic create-exclusive — the same
  * protocol the open table formats use (Delta's _delta_log, Iceberg's
  * snapshot metadata; public knowledge).
  *
  * Guarantees:
  *  - **Atomicity across tables**: a commit's tables become visible
  *    together or not at all (one manifest covers all of them — there
  *    is no observable state between).
  *  - **Snapshot isolation**: a reader resolves the newest manifest
  *    ONCE and reads every table from that version; a commit landing
  *    mid-query cannot mix versions.
  *  - **Crash safety**: a writer dying after data files but before the
  *    manifest leaves invisible orphans, never a torn commit.
  *  - **Optimistic concurrency**: two writers racing for version N —
  *    create-exclusive fails for the loser, who retries at N+1 (the
  *    serialization point is the filesystem's atomic create).
  *  - **Time travel**: old manifests keep old versions readable.
  *
  * At 100 TB the manifest holds table→path pointers, so commit cost is
  * O(1) in table size; data writes are normal partitioned/bucketed
  * parquet jobs.
  */
class Snapshots(s: SparkSession, root: String) {

  private val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
  private def commitDir = new Path(root, "_commits")
  private def commitPath(v: Long) = new Path(commitDir, f"$v%020d.manifest")

  /** Newest committed version, if any commit exists. */
  def currentVersion: Option[Long] = {
    if (!fs.exists(commitDir)) return None
    val vs = fs.listStatus(commitDir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Manifest format: one `table=relative/path` line per table.
    * Returns false ONLY on a lost version race (version v already
    * published by another writer); any other IO failure propagates —
    * treating a permission/quota error as a race would make commit()
    * retry (re-writing all table data each attempt) forever.
    */
  private def writeManifest(v: Long, tables: Map[String, String]): Boolean = {
    fs.mkdirs(commitDir)
    val body = tables.toSeq.sorted.map { case (t, p) => s"$t=$p" }.mkString("\n")
    try {
      // overwrite=false → atomic create-exclusive: exactly one writer
      // can publish version v; losers see FileAlreadyExistsException
      val out = fs.create(commitPath(v), false)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      // some FileSystem impls signal the exclusive-create loss as a bare
      // IOException; it is a race iff v's manifest now exists
      case e: java.io.IOException => if (fs.exists(commitPath(v))) false else throw e
    }
  }

  /** Attempt cap for optimistic-concurrency loops: losing this many
    * consecutive version races means something is structurally wrong
    * (a runaway committer, clock-free livelock) — surface it instead
    * of re-writing table data forever.
    */
  private val MaxAttempts = 16

  private def readManifest(v: Long): Map[String, String] = {
    val in = fs.open(commitPath(v))
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(t, p) = line.split("=", 2)
      t -> p
    }.toMap
  }

  /** Atomically commit a set of tables: write every DataFrame under
    * the next version's directory, then publish the manifest. Returns
    * the committed version. Retries the version claim on a concurrent
    * commit (data is re-written under the bumped version — optimistic
    * concurrency pays on conflict, not on the happy path).
    */
  def commit(tables: Map[String, DataFrame]): Long = {
    var attempt = currentVersion.getOrElse(0L) + 1
    for (_ <- 1 to MaxAttempts) {
      val written = tables.map { case (name, df) =>
        val rel = s"v$attempt/$name"
        df.write.mode("overwrite").parquet(s"$root/$rel")
        name -> rel
      }
      if (writeManifest(attempt, written)) return attempt
      attempt = math.max(attempt + 1, currentVersion.getOrElse(0L) + 1)
    }
    throw new IllegalStateException(
      s"commit lost $MaxAttempts consecutive version races under $root")
  }

  /** Re-point head at an older snapshot — the executable ROLLBACK
    * analog (reference: Stream.hs:166-231; an UNpublished commit is
    * simply abandoned, and this is the recovery path for a published
    * one). Publishes a NEW manifest whose table map is copied from
    * `version`: no data files move or are rewritten (O(1) in table
    * size), history is preserved — every version including the
    * rolled-back ones stays readable via time travel — and the same
    * create-exclusive protocol serializes it against racing commits.
    * Returns the new head version.
    */
  def rollbackTo(version: Long): Long = {
    val tables = readManifest(version) // throws if `version` was never committed
    var attempt = currentVersion.getOrElse(0L) + 1
    for (_ <- 1 to MaxAttempts) {
      if (writeManifest(attempt, tables)) return attempt
      attempt = math.max(attempt + 1, currentVersion.getOrElse(0L) + 1)
    }
    throw new IllegalStateException(
      s"rollback lost $MaxAttempts consecutive version races under $root")
  }

  /** One consistent view of every table at `version` (default: newest).
    * The manifest is resolved once, so all returned DataFrames belong
    * to the same committed snapshot.
    */
  def snapshot(version: Option[Long] = None): Map[String, DataFrame] = {
    val v = version.orElse(currentVersion)
      .getOrElse(throw new IllegalStateException(s"no commits under $root"))
    readManifest(v).map { case (t, rel) => t -> s.read.parquet(s"$root/$rel") }
  }

  /** Single-table read from the newest (or given) snapshot. */
  def read(table: String, version: Option[Long] = None): DataFrame =
    snapshot(version)(table)
}

/** `c04_snapshot_read`: the transactions flow end-to-end, hermetic per
  * run — commit v1 = (orders, per-status summary) as loaded, commit
  * v2 = the same pair with the CDC price transform applied to BOTH
  * tables in one atomic commit, then read the CURRENT snapshot and
  * verify the two tables agree with each other (the join would expose
  * a torn commit). The oracle is the closed form of the v2 state.
  */
object Snapshots {

  import graft.operators.t

  private def priced(o: DataFrame): DataFrame =
    o.select(col("o_orderkey"), col("o_orderstatus"),
      round(when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2.0)
        .otherwise(col("o_totalprice")), 2).as("price"))

  private def summarize(o: DataFrame): DataFrame =
    o.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"))

  def c04SnapshotRead(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/txn_c04$tag"
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root), true)
    val snap = new Snapshots(s, root)
    val v1 = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice"), 2).as("price"))
    snap.commit(Map("orders" -> v1, "summary" -> summarize(v1)))
    val v2 = priced(t(s, dir, "orders"))
    snap.commit(Map("orders" -> v2, "summary" -> summarize(v2)))
    // read the current snapshot ONCE; join detail to summary so a torn
    // commit (v2 orders with v1 summary) could not hash-match
    val cur = snap.snapshot()
    cur("orders").groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_detail"), round(sum("price"), 2).as("total_detail"))
      .join(cur("summary"), Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_detail"), col("total_detail"),
        col("n"), col("total"))
      .orderBy("o_orderstatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("c04_snapshot_read" -> c04SnapshotRead _)

  val oracles: Map[String, String] = Map(
    "c04_snapshot_read" ->
      """WITH p AS (
        |  SELECT o_orderstatus,
        |    round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2.0
        |               ELSE o_totalprice END, 2) AS price
        |  FROM orders
        |), agg AS (
        |  SELECT o_orderstatus, count(*) AS n, round(sum(price), 2) AS total
        |  FROM p GROUP BY 1
        |)
        |SELECT o_orderstatus, n AS n_detail, total AS total_detail, n, total
        |FROM agg ORDER BY o_orderstatus""".stripMargin)
}
