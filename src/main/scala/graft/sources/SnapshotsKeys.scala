package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The lake's oracle keys and their staged fixtures (c04-c20) —
  * split out of the [[Snapshots]] companion (r9); no behavior change.
  * Each `stagedXxxLake` builds a marker-gated per-sf fixture once;
  * each cNN key drives the verb under test and returns the oracle
  * projection.
  */
object SnapshotsKeys {
  import graft.operators.t

  private def priced(o: DataFrame): DataFrame =
    o.select(col("o_orderkey"), col("o_orderstatus"),
      round(when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2.0)
        .otherwise(col("o_totalprice")), 2).as("price"))

  private def summarize(o: DataFrame): DataFrame =
    o.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"))

  /** `c04_snapshot_read`: the transactions flow — commit a NEW version
    * of (orders, per-status summary) with the CDC price transform
    * applied to BOTH tables in one atomic commit, then read the
    * CURRENT snapshot and verify the two tables agree with each other
    * (the join would expose a torn commit). The oracle is the closed
    * form of the committed state.
    */
  def c04SnapshotRead(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/txn_c04$tag"
    val snap = new Snapshots(s, root)
    // the v1 base is FIXTURE (the table state a consumer's transaction
    // lands on), staged once per sf dir — the c03 precedent: per-run
    // cost is what a consumer actually pays per transaction, which is
    // the atomic two-table commit below plus the snapshot read, not a
    // from-scratch lake rebuild
    graft.StagedFixture.ensure(s, root, "G1") {
      val v1 = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
      snap.commit(Map("orders" -> v1, "summary" -> summarize(v1)))
    }
    val v2 = priced(t(s, dir, "orders"))
    snap.commit(Map("orders" -> v2, "summary" -> summarize(v2)))
    // warm re-runs re-commit the same pair as new versions — retention
    // keeps the shared lake bounded across bench/verify invocations
    snap.vacuum(keepLast = 2)
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

  /** Snapshot lake for c05, staged ONCE per sf dir (marker-gated, the
    * stagedLake pattern): orders committed range-clustered on
    * o_orderkey into 16 files with a footer-stats sidecar on the key
    * and price columns. Range clustering is what a real ingest gives a
    * time/key-ordered fact table — and what makes min/max skipping
    * effective.
    */
  def stagedStatsLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/stats_c05$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G2") {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartitionByRange(16, col("o_orderkey"))
      snap.commit(Map("orders" -> orders),
        statsCols = Map("orders" -> Seq("o_orderkey", "o_totalprice")))
    }
    snap
  }

  /** `c05_stats_pruned_read`: a key-range aggregate through the footer
    * -stats file-skipping read path ([[Snapshots.readWhere]]). The
    * predicate selects a small key prefix, so with 16 range-clustered
    * files the read opens 1-2 of them (TxnSpec machine-asserts
    * inputFiles shrink); the oracle proves skipping never changes the
    * answer.
    */
  def c05StatsPrunedRead(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedStatsLake(s, dir)
    snap.readWhere("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(1L), Some(600L))))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  /** Probe keys for c16 — fixed literals (they appear verbatim in the
    * oracle SQL), all within the key domain of every sf.
    */
  private val BloomProbeKeys: Seq[Any] = Seq(17L, 451L, 1063L)

  /** Snapshot lake for c16, staged ONCE per sf dir: orders
    * HASH-distributed on o_orderkey into 16 files — the anti-clustered
    * layout (every file's [min,max] spans the whole key domain, so
    * min/max skipping keeps all 16) — with BOTH sidecars committed:
    * `_stats` (useless here, present for realism) and `_bloom` on the
    * key column.
    */
  def stagedBloomLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/bloom_c16$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartition(16, col("o_orderkey"))
      snap.commit(Map("orders" -> orders),
        statsCols = Map("orders" -> Seq("o_orderkey")),
        bloomCols = Map("orders" -> Seq("o_orderkey")))
    }
    snap
  }

  /** `c16_bloom_pruned_read`: a needle IN-list lookup through the
    * bloom-index read path ([[Snapshots.readWhereIn]]) on the layout
    * min/max skipping cannot serve (hash-distributed key). With 16
    * files and 3 probe keys the read opens ≤3 files + a 1% fpp tail
    * (TxnSpec machine-asserts the plan's inputFiles, and that the
    * min/max-only path keeps all 16); the oracle proves skipping never
    * changes the answer.
    */
  def c16BloomPrunedRead(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedBloomLake(s, dir)
    snap.readWhereIn("orders", "o_orderkey", BloomProbeKeys)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderkey")
  }

  /** Snapshot lake for c06, staged ONCE per sf dir on its own root
    * (c06 mutates its lake, so it must not share c05's).
    */
  def stagedDeleteLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/del_c06$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G2") {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartitionByRange(16, col("o_orderkey"))
      snap.commit(Map("orders" -> orders),
        statsCols = Map("orders" -> Seq("o_orderkey")))
    }
    snap
  }

  /** `c06_delete_where`: the targeted-delete maintenance path
    * ([[Snapshots.deleteWhere]]) through the oracle gate — delete a key
    * slice from the staged lake (stats-pruned partial rewrite:
    * untouched files re-referenced, only range-overlapping files
    * rewritten), then aggregate the surviving table. Idempotent across
    * invocations: once deleted, the rewritten files' stats prove the
    * range absent and the repeat is a no-op — so Verify-then-Bench and
    * warm re-runs all see the same state, while the FIRST run exercises
    * the real rewrite. The oracle is the closed form over the same
    * parquet.
    */
  def c06DeleteWhere(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedDeleteLake(s, dir)
    snap.deleteWhere("orders",
      Seq(FileStats.ColRange("o_orderkey", Some(2000L), Some(2999L))),
      statsCols = Seq("o_orderkey"))
    // retention: a warm re-run re-rewrites files whose [min,max] still
    // SPANS the deleted range (stats can't prove a hole) and publishes a
    // new version — without collection the shared staged lake would grow
    // a version dir per invocation across bench/verify runs
    snap.vacuum(keepLast = 1)
    snap.read("orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  /** `c07_update_where`: the targeted-update path
    * ([[Snapshots.updateWhere]]) through the oracle gate. The SET
    * expression derives from an UNTOUCHED source column — a 10%
    * discount in EXACT integer-cents arithmetic ((9·cents+5) div 10 =
    * half-up of 0.9·cents; a double `round(x*0.9, 2)` flipped the
    * cross-engine hash on a half-cent knife edge) — so re-applying it
    * is idempotent by construction: Verify-then-Bench and warm re-runs
    * converge to one state while the first run pays the real partial
    * rewrite.
    */
  def c07UpdateWhere(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/upd_c07$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G3") {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          cents.as("price_cents"), cents.as("adj_cents"))
        .repartitionByRange(16, col("o_orderkey"))
      snap.commit(Map("orders" -> orders),
        statsCols = Map("orders" -> Seq("o_orderkey")))
    }
    snap.updateWhere("orders",
      Seq(FileStats.ColRange("o_orderkey", Some(5000L), Some(5999L))),
      Map("adj_cents" -> expr("CAST((price_cents * 9 + 5) div 10 AS BIGINT)")),
      statsCols = Seq("o_orderkey"))
    // same retention note as c06: the key-spanning files re-rewrite on
    // every warm run (o_orderkey stats can't prove the update applied),
    // so collect superseded versions to keep the shared lake bounded
    snap.vacuum(keepLast = 1)
    snap.read("orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("adj_cents").as("total_adj_cents"))
      .orderBy("o_orderstatus")
  }

  /** Snapshot lake for c08, staged ONCE per sf dir: version 1 commits
    * the base slice (o_orderkey % 4 != 0, range-clustered, key stats),
    * version 2 appends the complement, version 3 deletes keys
    * [3000, 3999]. Static after staging — readChanges needs versions 1
    * and 3 to stay time-travelable, so no vacuum here.
    */
  def stagedDiffLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/ver_c08$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G2") {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val all = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), cents.as("price_cents"))
      snap.commit(
        Map("orders" -> all.where(col("o_orderkey") % 4 =!= 0)
          .repartitionByRange(16, col("o_orderkey"))),
        statsCols = Map("orders" -> Seq("o_orderkey")))
      snap.append("orders", all.where(col("o_orderkey") % 4 === 0),
        statsCols = Seq("o_orderkey"))
      snap.deleteWhere("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(3000L), Some(3999L))),
        statsCols = Seq("o_orderkey"))
    }
    snap
  }

  /** `c08_version_diff`: the CDC-output path ([[Snapshots.readChanges]])
    * through the oracle gate. The diff between versions 1 and 3 is
    * reduced to NET row deltas (+1 added, −1 removed, grouped on the
    * full row), which cancels the file-layout-dependent churn of
    * partial rewrites: rows that merely rode along in a touched file
    * appear on both sides and net to zero, leaving exactly the appended
    * (+1) and deleted (−1) rows — a closed form DuckDB recomputes from
    * the raw table. Cost stays O(changed files): untouched base files
    * never enter the diff.
    */
  def c08VersionDiff(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedDiffLake(s, dir)
    val head = snap.currentVersion.get
    snap.readChanges("orders", 1L, head)
      .groupBy("o_orderkey", "o_orderstatus", "price_cents")
      .agg(sum(when(col("_change") === "added", 1L).otherwise(-1L)).as("delta"))
      .where(col("delta") =!= 0L)
      .groupBy("delta", "o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"))
      .orderBy("delta", "o_orderstatus")
  }

  /** Fixture for c15, staged ONCE per sf dir and STATIC after: v1
    * commits orders range-clustered with key stats; v2 MoR-deletes keys
    * [2000, 2999] (positional tombstones, zero files rewritten); v3
    * MoR-updates keys [5000, 5499] (+11 cents — tombstone + re-append
    * in one manifest). No compaction: the vectors STAND, so the diff
    * key must cross them.
    */
  def stagedDvDiffLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/dvdiff_c15$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      snap.commit(
        Map("orders" -> t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), cents.as("price_cents"))
          .repartitionByRange(16, col("o_orderkey"))),
        statsCols = Map("orders" -> Seq("o_orderkey")))
      snap.deleteWhereMoR("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(2000L), Some(2999L))))
      snap.updateWhereMoR("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(5000L), Some(5499L))),
        Map("price_cents" -> (col("price_cents") + 11L)),
        statsCols = Seq("o_orderkey"))
    }
    snap
  }

  /** `c15_dv_changes`: the DV-AWARE diff (Delta CDF semantics) through
    * the oracle gate — [[readChanges]] across two STANDING deletion
    * vectors. The MoR delete surfaces as positional `removed` rows from
    * unchanged files; the MoR update as removed pre-images (positional)
    * plus added post-images (the re-appended file, whose read excludes
    * nothing because the vector only names old files). The same c08
    * net-delta fold leaves exactly delete(−1), update-old(−1),
    * update-new(+1) — a closed form DuckDB recomputes from the raw
    * table. A resurrect bug (missed tombstone), a double-removal (DV
    * positions re-removed from a pre-image), or an attribution slip
    * flips the hash.
    */
  def c15DvChanges(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedDvDiffLake(s, dir)
    snap.readChanges("orders", 1L, snap.currentVersion.get)
      .groupBy("o_orderkey", "o_orderstatus", "price_cents")
      .agg(sum(when(col("_change") === "added", 1L).otherwise(-1L)).as("delta"))
      .where(col("delta") =!= 0L)
      .groupBy("delta", "o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"))
      .orderBy("delta", "o_orderstatus")
  }

  /** Snapshot lake for c10, staged ONCE per sf dir: orders projected to
    * (o_orderkey, o_orderstatus, price_cents), range-clustered into 16
    * files with key stats — the layout that makes MERGE's source-span
    * pruning effective.
    */
  def stagedMergeLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/mrg_c10$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), cents.as("price_cents"))
        .repartitionByRange(16, col("o_orderkey"))
      snap.commit(Map("orders" -> orders),
        statsCols = Map("orders" -> Seq("o_orderkey")))
    }
    snap
  }

  /** `c10_merge_into`: the MERGE/upsert verb ([[Snapshots.mergeInto]])
    * through the oracle gate — one source batch carrying BOTH updates
    * (keys 1000-1999 re-statused 'M' with doubled cents) and inserts
    * (mirrored negative keys, status 'I'), landed atomically via the
    * stats-pruned partial rewrite (source span [-999, 1999] touches the
    * low-key files only; the rest re-reference). The source derives
    * from the RAW table, so re-merging it is idempotent — warm re-runs
    * converge to one state while the first run pays the real merge —
    * and the oracle is the closed-form upsert DuckDB recomputes.
    */
  def c10MergeInto(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedMergeLake(s, dir)
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    val base = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), cents.as("price_cents"))
    val updates = base.where(col("o_orderkey").between(1000, 1999))
      .select(col("o_orderkey"), lit("M").as("o_orderstatus"),
        (col("price_cents") * 2).as("price_cents"))
    val inserts = base.where(col("o_orderkey").between(1, 999))
      .select((-col("o_orderkey")).as("o_orderkey"), lit("I").as("o_orderstatus"),
        (col("price_cents") + 7).as("price_cents"))
    snap.mergeInto("orders", updates.unionByName(inserts), "o_orderkey",
      statsCols = Seq("o_orderkey"))
    // same retention note as c06/c07: warm re-runs re-touch the span's
    // files and publish a new version — collect superseded ones
    snap.vacuum(keepLast = 1)
    snap.read("orders").groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  /** Snapshot lake for c11, staged ONCE per sf dir at the PRE-evolution
    * schema: documents (doc_id, lang) for doc_id % 3 == 0.
    */
  def stagedEvoLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/evo_c11$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      snap.commit(Map("documents" -> t(s, dir, "documents")
        .where(col("doc_id") % 3 === 0).select(col("doc_id"), col("lang"))))
    }
    snap
  }

  /** `c11_schema_evolution`: additive schema evolution through the
    * oracle gate — an O(batch) tagged append whose batch carries a NEW
    * `txt_len` column (mergeSchema = true), after which one read spans
    * both generations: pre-evolution rows surface txt_len as NULL (the
    * parquet missing-column contract), new rows carry their values. The
    * output pins both sides: `n_evolved` counts non-null txt_len (a
    * null-vs-zero confusion flips it), `total_len` sums the values. The
    * tag makes warm re-runs no-ops, so the state is one closed form
    * DuckDB recomputes from the raw table.
    */
  def c11SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedEvoLake(s, dir)
    snap.append("documents",
      t(s, dir, "documents").where(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("txt_len")),
      tag = Some("evo1"), mergeSchema = true)
    snap.read("documents").groupBy("lang")
      .agg(count(lit(1)).as("n"), count(col("txt_len")).as("n_evolved"),
        sum(coalesce(col("txt_len"), lit(0L))).as("total_len"))
      .orderBy("lang")
  }

  /** Fixture for c13: orders projected to a long key, a short string,
    * and a NULLABLE cents column (null on every 7th key — what makes
    * count(col) ≠ count(*) and exercises the null-count path), range-
    * clustered with stats on all three columns.
    */
  def stagedMetaLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/meta_c13$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(round(col("o_totalprice") * 100, 0).cast("long")).as("price_cents"))
      snap.commit(
        Map("orders" -> base.repartitionByRange(8, col("o_orderkey"))),
        statsCols = Map("orders" -> Seq("o_orderkey", "o_orderstatus", "price_cents")))
    }
    snap
  }

  /** `c13_metadata_agg`: count(*) / count(col) / min / max answered
    * from the manifest + `_stats` sidecars with ZERO data IO and zero
    * Spark jobs ([[Snapshots.aggStats]]) — the P in "a 100-TB table's
    * row count should cost a metadata lookup, not a scan". The oracle
    * recomputes the same aggregates from the raw table in DuckDB, so a
    * row-count, null-count, or min/max fold bug anywhere in the
    * footer-harvest → sidecar → fold chain flips the hash.
    */
  def c13MetadataAgg(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedMetaLake(s, dir)
    val (nRows, m) = snap.aggStats("orders",
      Seq("o_orderkey", "o_orderstatus", "price_cents"))
    val (nnK, minK, maxK) = m("o_orderkey")
    val (nnS, minS, maxS) = m("o_orderstatus")
    val (nnP, minP, maxP) = m("price_cents")
    import s.implicits._
    Seq((nRows,
      nnK, minK.get.asInstanceOf[Long], maxK.get.asInstanceOf[Long],
      nnS, minS.get.asInstanceOf[String], maxS.get.asInstanceOf[String],
      nnP, minP.get.asInstanceOf[Long], maxP.get.asInstanceOf[Long]))
      .toDF("n_rows", "nn_key", "min_key", "max_key",
        "nn_status", "min_status", "max_status",
        "nn_price", "min_price", "max_price")
  }

  /** Fixture for c14: orders range-clustered with key stats, then ONE
    * merge-on-read delete (keys 2000-2999) tombstoning by position —
    * no data file rewritten (the staged dirs still hold every row).
    */
  def stagedMorLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/mor_c14$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      snap.commit(
        Map("orders" -> t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), cents.as("price_cents"))
          .repartitionByRange(16, col("o_orderkey"))),
        statsCols = Map("orders" -> Seq("o_orderkey")))
      snap.deleteWhereMoR("orders",
        Seq(FileStats.ColRange("o_orderkey", Some(2000L), Some(2999L))))
    }
    snap
  }

  /** `c14_delete_mor`: the MERGE-ON-READ read path through the oracle
    * gate — the fixture's delete wrote only a positional tombstone
    * sidecar (every data file still physically holds every row), so
    * the aggregate is correct ONLY if the read's positional anti-join
    * applies the vector exactly: one extra surviving position, one
    * off-by-one row_index, or a file_name mix-up flips n, key_sum, or
    * total_cents against DuckDB's recompute.
    */
  def c14DeleteMor(s: SparkSession, dir: String): DataFrame = {
    stagedMorLake(s, dir).read("orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"),
        sum("o_orderkey").as("key_sum"))
      .orderBy("o_orderstatus")
  }

  /** Fixture for c17: an even-key orders slice with stats, about to be
    * renamed/dropped/appended through the column-mapping verbs.
    */
  def stagedColmapLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/cm_c17$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      snap.commit(Map("orders" -> t(s, dir, "orders")
        .where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .repartitionByRange(4, col("o_orderkey"))),
        statsCols = Map("orders" -> Seq("o_orderkey", "o_totalprice")))
    }
    snap
  }

  /** `c17_rename_column`: COLUMN MAPPING through the oracle gate — a
    * RENAME (o_totalprice → price) and a DROP (o_orderpriority), both
    * metadata-only, then a tagged append speaking the NEW name, an
    * idempotent range DELETE and a SET-to-constant UPDATE addressed by
    * the new name, and one read over both file generations. The
    * aggregate is right only if the logical↔physical translation is
    * exact on every path at once: the scan projection (old files carry
    * the old physical name), the append's reverse translation, the
    * stats-pruned classification of both DML verbs, and the dropped
    * column staying invisible without a rewrite. All verbs converge on
    * re-runs (tag replay, delete/SET-constant idempotence), so the
    * state is one closed form DuckDB recomputes from the raw table.
    */
  def c17RenameColumn(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedColmapLake(s, dir)
    if (snap.read("orders").columns.contains("o_totalprice"))
      snap.renameColumn("orders", "o_totalprice", "price")
    if (snap.read("orders").columns.contains("o_orderpriority"))
      snap.dropColumn("orders", "o_orderpriority")
    snap.append("orders", t(s, dir, "orders")
      .where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice").as("price")),
      tag = Some("cm1"), statsCols = Seq("o_orderkey", "price"))
    snap.deleteWhere("orders",
      Seq(FileStats.ColRange("o_orderkey", Some(2000L), Some(2999L))),
      Seq("o_orderkey", "price"))
    snap.updateWhere("orders",
      Seq(FileStats.ColRange("o_orderkey", Some(1L), Some(10L))),
      Map("price" -> lit(0.0)), Seq("o_orderkey", "price"))
    snap.read("orders")
      .groupBy((col("o_orderkey") % 5).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum("price"), 2).as("total_price"),
        count(when(col("price") === 0.0, 1)).as("n_zeroed"))
      .orderBy("bucket")
  }

  /** Fixture for c18: a supplier slice created WITH a bigint key
    * column that then becomes the table's identity column.
    */
  def stagedIdentityLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/id_c18$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      snap.commit(Map("suppliers" -> t(s, dir, "supplier")
        .where(col("s_suppkey") % 2 === 0)
        .select(col("s_suppkey").as("sid"), col("s_name"), col("s_nationkey"))))
      snap.addIdentity("suppliers", "sid")
    }
    snap
  }

  /** `c18_identity_append`: IDENTITY assignment through the oracle
    * gate — the lake assigns `sid` to a batch that omits it, starting
    * exactly past the declared-time max (addIdentity's one scan) and
    * advancing the mark atomically with the data. The batch is staged
    * single-partition in s_suppkey order, so the dense ids are a
    * closed form (row_number over the sorted odd keys + the even-key
    * max) DuckDB recomputes from the raw table; the tag makes warm
    * re-runs no-ops so the state stays deterministic. A wrong start,
    * a gap, a duplicate, or a replay that burns ids flips the join.
    */
  def c18IdentityAppend(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedIdentityLake(s, dir)
    snap.appendIdentity("suppliers",
      t(s, dir, "supplier").where(col("s_suppkey") % 2 === 1)
        .select(col("s_name"), col("s_nationkey"))
        .orderBy("s_name").coalesce(1).sortWithinPartitions("s_name"),
      tag = Some("id1"), statsCols = Seq("sid"))
    snap.read("suppliers")
      .groupBy(col("s_nationkey").cast("long").as("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum("sid").as("sid_sum"),
        max("sid").as("sid_max"))
      .orderBy("s_nationkey")
  }

  /** Fixture for c19: an orders slice committed once, then marked
    * appendOnly (plus an inert informational property).
    */
  def stagedPropsLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/props_c19$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      snap.commit(Map("orders" -> t(s, dir, "orders")
        .where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("price_cents"))),
        statsCols = Map("orders" -> Seq("o_orderkey")))
      snap.setProperties("orders",
        Map("appendOnly" -> "true", "owner" -> "curation"))
    }
    snap
  }

  /** Fixture for c20: the even orders slice, keyed stats on
    * o_orderkey so replaceWhere's file classification can prune.
    */
  def stagedReplaceLake(s: SparkSession, dir: String): Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/repl_c20$tag"
    val snap = new Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G1") {
      snap.commit(Map("orders" -> t(s, dir, "orders")
        .where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("price_cents"))
        .repartition(8)),
        statsCols = Map("orders" -> Seq("o_orderkey")))
    }
    snap
  }

  /** `c20_replace_where`: predicate-scoped OVERWRITE under the oracle
    * gate — the backfill re-delivers keys 1000-1999 (all parities, new
    * closed-form prices) over the even-only base, so the replaced
    * slice changes BOTH membership and values; a batch row outside the
    * slice must refuse before anything publishes. Replays converge,
    * so the per-call re-run is safe. The final read equals
    * (evens outside the slice) ∪ (the backfill batch) — a kept row
    * lost, a survivor dropped, or a leaked out-of-slice row flips the
    * oracle hash.
    */
  def c20ReplaceWhere(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedReplaceLake(s, dir)
    val slice = Seq(FileStats.ColRange("o_orderkey", Some(1000L), Some(1999L)))
    val batch = t(s, dir, "orders")
      .where(col("o_orderkey").between(1000L, 1999L))
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_orderkey") * 3).cast("long").as("price_cents"))
    val refused =
      try {
        snap.replaceWhere("orders", slice,
          batch.unionByName(batch.limit(1)
            .withColumn("o_orderkey", lit(5001L))), Seq("o_orderkey"))
        false
      } catch { case _: IllegalArgumentException => true }
    require(refused, "replaceWhere accepted an out-of-slice batch row")
    snap.replaceWhere("orders", slice, batch, Seq("o_orderkey"))
    snap.read("orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("price_cents").as("total_cents"),
        sum("o_orderkey").as("key_sum"))
      .orderBy("o_orderstatus")
  }

  /** `c19_append_only`: TABLE PROPERTIES under the oracle gate — the
    * appendOnly contract exercised end-to-end. The key appends the odd
    * half (tagged, so replays no-op), then drives a copy-on-write
    * delete AND a merge-on-read delete into the guarded table: BOTH
    * must refuse, and the final read must equal the closed-form
    * evens+odds recompute — if the guard silently failed, the deleted
    * rows would be missing and the oracle hash would flip. `n_props`
    * crosses the property-count metadata into the compared rows.
    */
  def c19AppendOnly(s: SparkSession, dir: String): DataFrame = {
    val snap = stagedPropsLake(s, dir)
    snap.append("orders", t(s, dir, "orders")
      .where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_cents")),
      tag = Some("ao1"), statsCols = Seq("o_orderkey"))
    val ranges = Seq(FileStats.ColRange("o_orderkey", Some(1L), Some(500L)))
    val cowBlocked =
      try { snap.deleteWhere("orders", ranges, Seq("o_orderkey")); false }
      catch { case _: IllegalArgumentException => true }
    val morBlocked =
      try { snap.deleteWhereMoR("orders", ranges); false }
      catch { case _: IllegalArgumentException => true }
    require(cowBlocked && morBlocked,
      "appendOnly guard failed to refuse a delete verb")
    val nProps = snap.properties("orders").size.toLong
    snap.read("orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("price_cents").as("total_cents"),
        sum("o_orderkey").as("key_sum"))
      .withColumn("n_props", lit(nProps))
      .orderBy("o_orderstatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("c04_snapshot_read" -> c04SnapshotRead _,
        "c19_append_only" -> c19AppendOnly _,
        "c20_replace_where" -> c20ReplaceWhere _,
        "c17_rename_column" -> c17RenameColumn _,
        "c18_identity_append" -> c18IdentityAppend _,
        "c14_delete_mor" -> c14DeleteMor _,
        "c05_stats_pruned_read" -> c05StatsPrunedRead _,
        "c16_bloom_pruned_read" -> c16BloomPrunedRead _,
        "c06_delete_where" -> c06DeleteWhere _,
        "c07_update_where" -> c07UpdateWhere _,
        "c08_version_diff" -> c08VersionDiff _,
        "c15_dv_changes" -> c15DvChanges _,
        "c10_merge_into" -> c10MergeInto _,
        "c11_schema_evolution" -> c11SchemaEvolution _,
        "c13_metadata_agg" -> c13MetadataAgg _)

  val oracles: Map[String, String] = Map(
    "c20_replace_where" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders WHERE o_orderkey % 2 = 0
        |), kept AS (
        |  SELECT * FROM base WHERE o_orderkey NOT BETWEEN 1000 AND 1999
        |), backfill AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_orderkey * 3 AS BIGINT) AS price_cents
        |  FROM orders WHERE o_orderkey BETWEEN 1000 AND 1999
        |), allr AS (
        |  SELECT * FROM kept UNION ALL SELECT * FROM backfill
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM allr GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "c19_append_only" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(2 AS BIGINT) AS n_props
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "c18_identity_append" ->
      """WITH evens AS (
        |  SELECT s_suppkey AS sid, s_nationkey FROM supplier WHERE s_suppkey % 2 = 0
        |), mx AS (
        |  SELECT max(sid) AS m FROM evens
        |), odds AS (
        |  SELECT (SELECT m FROM mx) + row_number() OVER (ORDER BY s_name) AS sid,
        |    s_nationkey
        |  FROM supplier WHERE s_suppkey % 2 = 1
        |), allr AS (
        |  SELECT sid, s_nationkey FROM evens
        |  UNION ALL SELECT sid, s_nationkey FROM odds
        |)
        |SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |  count(*) AS n,
        |  CAST(sum(sid) AS BIGINT) AS sid_sum,
        |  CAST(max(sid) AS BIGINT) AS sid_max
        |FROM allr GROUP BY 1 ORDER BY 1""".stripMargin,
    "c17_rename_column" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice AS price FROM orders
        |), st AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey BETWEEN 1 AND 10 THEN 0.0 ELSE price END AS price
        |  FROM base WHERE o_orderkey NOT BETWEEN 2000 AND 2999
        |)
        |SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(sum(price), 2) AS total_price,
        |  CAST(count(CASE WHEN price = 0.0 THEN 1 END) AS BIGINT) AS n_zeroed
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    "c14_delete_mor" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |  WHERE o_orderkey NOT BETWEEN 2000 AND 2999
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "c13_metadata_agg" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS price_cents
        |  FROM orders
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(o_orderkey) AS BIGINT) AS nn_key,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(count(o_orderstatus) AS BIGINT) AS nn_status,
        |  min(o_orderstatus) AS min_status, max(o_orderstatus) AS max_status,
        |  CAST(count(price_cents) AS BIGINT) AS nn_price,
        |  min(price_cents) AS min_price, max(price_cents) AS max_price
        |FROM c""".stripMargin,
    "c10_merge_into" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |), m AS (
        |  SELECT o_orderkey, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey NOT BETWEEN 1000 AND 1999
        |  UNION ALL
        |  SELECT o_orderkey, 'M' AS o_orderstatus, price_cents * 2 FROM c
        |  WHERE o_orderkey BETWEEN 1000 AND 1999
        |  UNION ALL
        |  SELECT -o_orderkey, 'I' AS o_orderstatus, price_cents + 7 FROM c
        |  WHERE o_orderkey BETWEEN 1 AND 999
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "c11_schema_evolution" ->
      """WITH u AS (
        |  SELECT lang, CAST(NULL AS BIGINT) AS txt_len FROM documents
        |  WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT lang, CAST(length(text) AS BIGINT) AS txt_len FROM documents
        |  WHERE doc_id % 3 = 1
        |)
        |SELECT lang, count(*) AS n, count(txt_len) AS n_evolved,
        |  CAST(sum(COALESCE(txt_len, 0)) AS BIGINT) AS total_len
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "c08_version_diff" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |), d AS (
        |  SELECT CAST(1 AS BIGINT) AS delta, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey % 4 = 0 AND o_orderkey NOT BETWEEN 3000 AND 3999
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT) AS delta, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey % 4 <> 0 AND o_orderkey BETWEEN 3000 AND 3999
        |)
        |SELECT delta, o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM d GROUP BY delta, o_orderstatus
        |ORDER BY delta, o_orderstatus""".stripMargin,
    "c15_dv_changes" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |), d AS (
        |  SELECT CAST(-1 AS BIGINT) AS delta, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey BETWEEN 2000 AND 2999
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT) AS delta, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey BETWEEN 5000 AND 5499
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT) AS delta, o_orderstatus, price_cents + 11 FROM c
        |  WHERE o_orderkey BETWEEN 5000 AND 5499
        |)
        |SELECT delta, o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM d GROUP BY delta, o_orderstatus
        |ORDER BY delta, o_orderstatus""".stripMargin,
    "c06_delete_where" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderkey NOT BETWEEN 2000 AND 2999
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c07_update_where" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderkey BETWEEN 5000 AND 5999
        |                THEN (price_cents * 9 + 5) // 10
        |                ELSE price_cents END) AS BIGINT) AS total_adj_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
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
        |FROM agg ORDER BY o_orderstatus""".stripMargin,
    "c05_stats_pruned_read" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderkey BETWEEN 1 AND 600
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "c16_bloom_pruned_read" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_orderkey IN (17, 451, 1063)
        |ORDER BY o_orderkey""".stripMargin)
}
