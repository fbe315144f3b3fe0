package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{ChangeFeed, Jdbc, Snapshots}

/** Lake-to-DATABASE replication driven by the change feed — the
  * reference's loop closed in the other direction (README.md:10-14
  * streams changes OUT of Postgres; pgstream users equally push
  * computed state BACK, Stream.hs:122-145 `executeMany` inserts):
  * the lake is the system of record, and a serving database tails it
  * through the same per-version diffs replication (c12) and matviews
  * (st08) consume.
  *
  * Per-key resolution is [[Replicate]]'s: within a micro-batch the
  * LAST source version touching a key decides it — final `added` row =
  * upsert, no added row = delete. The JDBC apply is the portable
  * upsert, DELETE(touched keys) then INSERT(final live rows) — MERGE
  * syntax is dialect-specific, delete+insert is not — and both legs
  * stream through per-partition PreparedStatement batches under the
  * connection budget: no data row ever crosses the driver.
  *
  * Exactly-once: the verbs converge row-level exactly like the lake
  * pair (a replayed batch re-deletes absent keys and re-inserts
  * identical rows), so a checkpoint-restart replay lands harmlessly.
  * Per-partition atomicity is the honest distributed-writer contract
  * (writeTable's doc): a torn batch is repaired by its own retry or
  * the next replay, never silently half-applied forever.
  */
object JdbcReplicate {

  /** foreachBatch body: apply one change-feed micro-batch into
    * `jdbcTable` at `cs`. `keyCol` is the replication key.
    */
  def applyBatchJdbc(cs: Jdbc.ConnSettings, jdbcTable: String, keyCol: String,
                     numPartitions: Int = 8)
                    (batch: DataFrame, batchId: Long): Unit = {
    val cached = batch.persist()
    try {
      if (cached.isEmpty) return
      val dataCols = batch.columns
        .filterNot(c => c == "_change" || c == "_commit_version").toSeq
      val vmax = cached.groupBy(col(keyCol))
        .agg(max(col("_commit_version")).as("_vmax"))
        .select(col(keyCol).as("_rk"), col("_vmax"))
      val last = cached
        .join(vmax, col(keyCol) === col("_rk") && col("_commit_version") === col("_vmax"))
        .persist()
      try {
        // 1. DELETE every touched key: clears dead keys AND the old
        //    images of rows about to be re-inserted (the upsert's
        //    delete half). Job completes before the insert job starts —
        //    foreachBatch bodies run actions sequentially.
        deleteKeys(cs, jdbcTable, keyCol,
          last.select(col(keyCol)).distinct(),
          math.min(numPartitions, cs.maxConnections))
        // 2. INSERT each key's final live row.
        val ups = last.where(col("_change") === "added")
          .select(dataCols.map(col): _*)
        if (!ups.isEmpty)
          Jdbc.writeTable(ups, cs, jdbcTable, mode = "append",
            numPartitions = math.min(numPartitions, cs.maxConnections))
      } finally { last.unpersist(); () }
    } finally { cached.unpersist(); () }
  }

  /** Stream `keys` through per-partition parameterized DELETE batches —
    * the mirror of writeTable's insert path (one connection per
    * partition, `executeBatch` every 1000 keys).
    */
  private def deleteKeys(cs: Jdbc.ConnSettings, table: String, keyCol: String,
                         keys: DataFrame, numPartitions: Int): Unit = {
    val (url, user, password, init, extra) =
      (cs.url, cs.user, cs.password, cs.sessionInit, cs.props)
    keys.coalesce(math.max(1, numPartitions)).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val props = new java.util.Properties()
        if (user.nonEmpty) props.setProperty("user", user)
        if (password.nonEmpty) props.setProperty("password", password)
        extra.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          init.foreach { sqlText =>
            val st = conn.createStatement(); try st.execute(sqlText) finally st.close()
          }
          val ps = conn.prepareStatement(s"DELETE FROM $table WHERE $keyCol = ?")
          try {
            var n = 0
            it.foreach { r =>
              ps.setObject(1, r.get(0)); ps.addBatch()
              n += 1; if (n % 1000 == 0) { ps.executeBatch(); () }
            }
            ps.executeBatch(); ()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  /** Drive the change feed of `src.table` into `jdbcTable` until all
    * pending versions are applied (AvailableNow), from `startingVersion`
    * with a caller-owned checkpoint.
    */
  def replicateToJdbc(s: SparkSession, src: Snapshots, table: String,
                      keyCol: String, cs: Jdbc.ConnSettings, jdbcTable: String,
                      checkpoint: String, startingVersion: Long = 0L): Unit = {
    val q = s.readStream
      .format(classOf[ChangeFeed].getName)
      .option("path", src.rootPath).option("table", table)
      .option("startingVersion", startingVersion.toString)
      .load()
      .writeStream
      .foreachBatch(applyBatchJdbc(cs, jdbcTable, keyCol) _)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new IllegalStateException("st09 change-feed drain timed out")
    } finally q.stop()
  }

  /** Replication-source fixture for st09, staged ONCE per sf dir: the
    * same verb sequence as c12's lake (commit, range delete, range
    * update, @maint compaction, append) over a BOUNDED key slice
    * (o_orderkey < 5000 — every verb range lies inside). The slice
    * keeps the key timing the replication MACHINERY, not embedded
    * Derby's single-node insert throughput on the whole fact table;
    * the closed forms stay DuckDB-recomputable with one extra WHERE.
    */
  private def stagedJdbcSrcLake(s: SparkSession, dir: String): Snapshots = {
    import graft.sources.FileStats
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/jdbc_src_st09$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val base = s.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 5000L)
        .select(col("o_orderkey"), col("o_orderstatus"), cents.as("price_cents"))
      snap.commit(Map("orders" -> base.repartitionByRange(8, col("o_orderkey"))),
        Map("orders" -> Seq("o_orderkey")))                                 // v1
      snap.deleteWhere("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(3000L), Some(3999L))),
        Seq("o_orderkey"))                                                  // v2
      snap.updateWhere("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(1000L), Some(1999L))),
        Map("price_cents" -> (col("price_cents") + 7L)), Seq("o_orderkey")) // v3
      snap.compact("orders", targetBytes = 1L << 22,
        sortCol = Some("o_orderkey"), statsCols = Seq("o_orderkey"))        // v4 @maint
      snap.append("orders", base.select(
        (col("o_orderkey") + 20000000L).as("o_orderkey"),
        col("o_orderstatus"), (col("price_cents") + 1L).as("price_cents")),
        statsCols = Seq("o_orderkey"))                                      // v5
    }
    snap
  }

  /** `st09_replicate_jdbc`: the FULL loop against embedded Derby (the
    * JDBC engine available in-container; against Postgres only the url
    * changes) — bootstrap an empty database table from the source
    * lake's version 0 and tail every verb (base commit, range delete,
    * range update, @maint compaction the feed must skip, append) in one
    * catch-up pass, then read the table BACK through the JDBC source
    * and aggregate. The oracle recomputes the head from the raw orders
    * closed forms — a missed delete, an unapplied update, or a
    * double-applied batch flips the hash. Fresh table + fresh
    * checkpoint per run keeps the key deterministic across
    * verify-then-bench invocations.
    */
  def st09ReplicateJdbc(s: SparkSession, dir: String): DataFrame = {
    val src = stagedJdbcSrcLake(s, dir)
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val dbPath = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
      s"/jdbc_repl_st09$tag/db"
    val cs = Jdbc.ConnSettings.fromUrl(s"jdbc:derby:$dbPath")
    // fresh destination table per run (deterministic replay surface)
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbPath;create=true")
    try {
      val st = conn.createStatement()
      try {
        try { st.execute("DROP TABLE ORDERS_R"); () }
        catch { case _: java.sql.SQLException => () } // first run: no table
        st.execute(
          "CREATE TABLE ORDERS_R (O_ORDERKEY BIGINT NOT NULL PRIMARY KEY, " +
            "O_ORDERSTATUS VARCHAR(8), PRICE_CENTS BIGINT)")
        ()
      } finally st.close()
    } finally conn.close()
    val ckpt = java.nio.file.Files.createTempDirectory("st09_ckpt").toString
    replicateToJdbc(s, src, "orders", "o_orderkey", cs, "ORDERS_R", ckpt)
    Jdbc.readQuery(s, cs,
        "SELECT O_ORDERSTATUS, PRICE_CENTS, O_ORDERKEY FROM ORDERS_R")
      .select(col("O_ORDERSTATUS").as("o_orderstatus"),
        col("PRICE_CENTS").as("price_cents"), col("O_ORDERKEY").as("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"),
        sum("o_orderkey").as("key_sum"))
      .orderBy("o_orderstatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("st09_replicate_jdbc" -> st09ReplicateJdbc _)

  val oracles: Map[String, String] = Map(
    "st09_replicate_jdbc" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders WHERE o_orderkey < 5000
        |), r AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    price_cents + CASE WHEN o_orderkey BETWEEN 1000 AND 1999
        |      THEN 7 ELSE 0 END AS price_cents
        |  FROM c WHERE o_orderkey NOT BETWEEN 3000 AND 3999
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_orderstatus, price_cents + 1 FROM c
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
