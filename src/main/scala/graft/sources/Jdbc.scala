package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC/Postgres source path — the direct analog of the reference's
  * connection layer (reference: Connection.hs:29-71 `ConnSettings`, and
  * the cursor-paged `stream`, Stream.hs:244-277).
  *
  * NOTE: this container is zero-egress with no live Postgres, so this
  * path is code-complete but exercised only up to reader construction
  * (JdbcSpec); the parquet Catalog is the tested source. The options
  * below are the ones that matter against a real database at scale:
  *
  *  - `partitionColumn/lowerBound/upperBound/numPartitions` shards the
  *    scan into parallel range queries — the distributed analog of the
  *    reference's `FETCH FORWARD n` cursor pages, except pages run
  *    concurrently on executors instead of serially on one socket.
  *  - `fetchsize` bounds per-round-trip rows exactly like the
  *    reference's batch size argument to `stream`.
  *  - `pushDownPredicate`/`pushDownAggregate` let Catalyst ship WHERE
  *    clauses (and simple aggs) to the database — what pgstream users
  *    achieve by writing them into their SQL text.
  */
object Jdbc {

  /** Connection settings, mirroring the reference's ConnSettings shape
    * (host/port/db/user/password → a JDBC url + properties).
    * `urlOverride` lets tests target any JDBC database (JdbcSpec runs
    * the whole path against embedded Derby — the JDBC engine that
    * ships with Spark — since the container has no live Postgres).
    */
  /** `sessionInit` and `props` carry the reference pool's remaining
    * per-connection knobs (Connection.hs:29-71 keepalive/affinity) in
    * the form a per-task JDBC connection can honor: `sessionInit` runs
    * ONCE on every connection before its first query (Spark's
    * sessionInitStatement — the SET search_path / role / GUC affinity
    * analog), and `props` passes driver-level socket options through
    * verbatim (e.g. Postgres `tcpKeepAlive=true`, `socketTimeout`,
    * `connectTimeout` — the WAN-flakiness knobs keepalive exists for).
    * A cross-task idle POOL itself remains a non-goal (SURVEY §8):
    * Spark partitions open, drain, and close their connection in one
    * task, so there is no idle socket to keep alive between uses.
    */
  case class ConnSettings(
      host: String,
      port: Int = 5432,
      database: String = "postgres",
      user: String = "postgres",
      password: String = "",
      fetchSize: Int = 10000,
      maxConnections: Int = 32,
      urlOverride: Option[String] = None,
      sessionInit: Option[String] = None,
      props: Map[String, String] = Map.empty) {
    def url: String = urlOverride.getOrElse(s"jdbc:postgresql://$host:$port/$database")

    /** The option set every JDBC surface of this module shares. */
    def commonOptions: Map[String, String] =
      Map("url" -> url, "user" -> user, "password" -> password,
        "fetchsize" -> fetchSize.toString) ++
        sessionInit.map("sessionInitStatement" -> _) ++ props
  }

  object ConnSettings {
    /** The reference's `connect_alt` shape (Connection.hs — connect by
      * a single connection STRING instead of discrete fields): any JDBC
      * url verbatim, remaining knobs defaulted and overridable via
      * `.copy`.
      */
    def fromUrl(url: String, user: String = "", password: String = ""): ConnSettings =
      ConnSettings(host = "", user = user, password = password,
        urlOverride = Some(url))
  }

  /** Whole-table (or subquery) read, range-partitioned on `partitionCol`
    * so every executor owns a slice — never a single-connection scan.
    *
    * Connection budget — the pooling behavior a Spark reader can still
    * honor from the reference's striped pool (Connection.hs:29-71
    * stripes/keepalive/affinity): Spark has no cross-task pool (each
    * read partition opens its own connection for its range query, and
    * cluster-wide concurrency is the scheduler's job), so the pool's
    * `stripes` cap maps to `numPartitions ≤ maxConnections` — the
    * database's effective max_connections share for this reader. The
    * require makes the overload loud at plan time instead of as
    * "FATAL: sorry, too many clients" from a thousand executors.
    */
  def read(
      spark: SparkSession,
      cs: ConnSettings,
      table: String,
      partitionCol: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 32): DataFrame = {
    require(numPartitions <= cs.maxConnections,
      s"numPartitions=$numPartitions exceeds maxConnections=${cs.maxConnections}: " +
        "each partition holds one database connection for its range query; " +
        "raise ConnSettings.maxConnections only to the database's budget for this reader")
    spark.read.format("jdbc")
      .options(cs.commonOptions)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("pushDownPredicate", true)
      .load()
  }

  /** Unpartitioned read for small dimension tables (single query, then
    * typically `broadcast()`ed into joins).
    */
  def readDim(spark: SparkSession, cs: ConnSettings, table: String): DataFrame =
    spark.read.format("jdbc")
      .options(cs.commonOptions)
      .option("dbtable", table)
      .load()

  /** Bulk WRITE-BACK — the reference's `execute`-driven INSERT path
    * (Stream.hs:122-145) at Spark scale: each write partition opens one
    * connection and streams its rows as parameterized batched inserts
    * (`batchsize` rows per round trip — the reference's batch argument
    * to `executeMany`), with `numPartitions` capped by the same
    * connection budget as [[read]]. `mode` follows Spark semantics:
    * "append" = pure INSERTs; "overwrite" = replace the table (with
    * `truncate` so a dialect that supports TRUNCATE keeps the DDL and
    * its grants/indexes instead of drop+recreate). Exports that must
    * be upserts go through the lake's own MERGE ([[Snapshots.mergeInto]])
    * before a plain append export, or land in a staging table the
    * database merges — a distributed writer cannot hold one
    * transaction across partitions, so per-partition atomicity is the
    * honest contract (each partition's batch either lands or its task
    * retries; make the TARGET table idempotent-friendly for retries).
    */
  def writeTable(df: DataFrame, cs: ConnSettings, table: String,
                 mode: String = "append", numPartitions: Int = 8,
                 batchSize: Int = 10000): Unit = {
    require(numPartitions <= cs.maxConnections,
      s"numPartitions=$numPartitions exceeds maxConnections=${cs.maxConnections}: " +
        "each write partition holds one database connection for its insert stream")
    df.coalesce(numPartitions).write.format("jdbc")
      .options(cs.commonOptions)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("truncate", true)
      .mode(mode)
      .save()
  }

  /** Arbitrary-SQL read — the direct `query`/`query_` analog
    * (reference: Stream.hs:92-115): the caller's SQL text runs ON the
    * database and only its result crosses the wire, exactly like a
    * pgstream `query [sql|…|]` call. For large results prefer [[read]]
    * with range partitioning; this is the single-cursor form.
    */
  def readQuery(spark: SparkSession, cs: ConnSettings, sql: String): DataFrame =
    spark.read.format("jdbc")
      .options(cs.commonOptions)
      .option("query", sql)
      .load()
}
