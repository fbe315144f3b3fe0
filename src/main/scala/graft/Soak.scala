package graft

import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak: the gate runs everything at sf0.1 under a 24g heap where
  * nothing ever spills — plan SHAPES say the operators scale, but only
  * pressure says so empirically. This main replicates the sf0.1 corpus
  * 10× (key-remapped so joins stay consistent and texts stay distinct —
  * exact-duplicate replicas would turn the dedup keys into a different,
  * degenerate workload) into the warehouse dir, then runs the heaviest
  * keys at BOTH scales inside ONE constrained heap
  * (`SPARK_DRIVER_MEM=8g sbt "runMain graft.Soak"`), recording wall,
  * task_ms, GC and peak-heap per key. The pass criterion is completion
  * without OOM and ~linear task_ms growth (ratio ≈ 10× ± constant
  * overheads); a superlinear ratio is a scale cliff to fix, not a
  * number to report. Results land in SOAK.md + soak.json.
  *
  * Testdata is read-only and never touched; the 10× corpus is derived,
  * marker-gated, and lives under spark.sql.warehouse.dir.
  */
object Soak {

  /** The keys the round-6 audit named most expensive, plus the q20
    * salted shuffle now that it is honestly measured, plus the round-7
    * streaming-lake paths (change-feed matview fold and feed-driven
    * replication) so the micro-batch + DML-verb machinery also proves
    * itself under a 10× source at the constrained heap.
    */
  val keys: Seq[String] = Seq(
    "d04_dedup_ngram", "d07_dedup_clusters", "q31_typed_wide", "q33_profile",
    "s06_ann_ivfpq", "c03_cdc_merge", "q20_salted_join",
    "st08_stream_matview", "c12_replicate", "c14_delete_mor",
    // round-8 additions: the new retrieval/mixture paths at 10× — t17's
    // postings-only shuffle and s09's top-100-per-leg fusion must stay
    // O(matching postings)/O(leg), and t18's corpus pass must stay linear
    "t17_bm25", "s09_hybrid_rrf", "t18_domain_mix",
    // fifth-wave additions: t19's window-hash explode is linear in
    // corpus CHARS (the heaviest new scaling dimension) and d09's
    // band-join candidate set must track distinct-hash count, not docs
    "t19_substring_dedup", "d09_image_neardup",
    // round-9: trained IVF at the adaptive-nlist ceiling — the 10×
    // embeddings corpus (20k vectors) drives adaptiveNlist to 256
    // (n/64 capped), so the soak exercises k-means|| init + Lloyd at
    // the production list count; probe task_ms must stay ~linear
    // (the scored fraction is pinned at ~25% by nprobe = nlist/4,
    // and training is staged — the key times search)
    "s03_ann_ivf",
    // ninth-wave additions: d11's within-cluster pair work is
    // Σ(cluster size)², but d11Semdedup scales k with the corpus
    // (k = max(8, n/64)), so a 10× corpus gets 10× clusters of the
    // SAME expected size ~64 — pair work grows ~linearly (the paper's
    // own scaling recipe). The soak therefore expects a ~10× task_ms
    // ratio here like every other key; a quadratic ratio would mean
    // the adaptive-k guard broke. d12's component+quality join must
    // stay linear over the 10× pair graph
    "d11_semdedup", "d12_cluster_keep_best",
    // round-10: the q33 sketch twin — the exact profile's Expand showed
    // 18x task at 10x (documented superlinearity); the approx twin must
    // show the ~linear ratio that makes the 100-TB doctrine executable
    "q33_profile_approx",
    // round-10 second wave: t29's MG candidate pass is bounded-memory by
    // construction but the exact recount's InSet scan must stay linear;
    // p01 composes five stages — a superlinear ratio would mean the
    // composition (not any verified stage) introduced a blowup; s13's
    // byte-dot codes scan is O(corpus × queries) at fixed queries, so
    // linear in the corpus like s05
    "t29_heavy_hitters", "p01_pipeline_e2e", "s13_ann_sq8",
    // round-11: the SQL front door's heavy verbs at 10× — d15's CALL is
    // the exact-dedup groupBy + the one-version replaceWhere rewrite
    // (both linear); s15's CALL trains k-means|| at the adaptive list
    // count then probes through the clustered index table (the scan is
    // file-skipped to probed lists — task_ms must track corpus, not
    // blow up with it); c36's atomic CTAS+REPLACE pays two clustered
    // seeding writes (append's range shuffle, linear in the batch)
    "d15_sql_dedup", "s15_ann_sql_ivf", "c36_replace_table")

  /** The ngram-dedup family gets a THIRD scale point (r11 verdict #8:
    * d04/d07 showed cpu_ratio ≈ 3.1-3.2 at 10× — mildly superlinear;
    * one more decade tells a saturating df-cap curve apart from a
    * steepening one). Only documents is the scaled dimension.
    */
  val ngramKeys: Seq[String] = Seq("d04_dedup_ngram", "d07_dedup_clusters",
    "d08_dedup_incremental_ngram", "d14_dedup_containment")

  private final class MetricsListener extends SparkListener {
    val runMs = new AtomicLong; val gcMs = new AtomicLong; val tasks = new AtomicLong
    val cpuMs = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime); gcMs.addAndGet(m.jvmGCTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000L); tasks.incrementAndGet()
      }
    }
    def snap(): (Long, Long, Long, Long) = (runMs.get, gcMs.get, tasks.get, cpuMs.get)
  }

  /** Replicate the four tables the soak keys touch, 10×. Key remap per
    * replica k: +k·10⁷ on order keys (orders⋈lineitem stays consistent),
    * +k·10⁶ on doc/vec ids. Replica texts get a distinct suffix token;
    * replica embeddings keep their direction (cosine-invariant) under
    * fresh ids, with the ORIGINAL query ids (vec_id < NQueries) left
    * unreplicated so the ANN keys scale the corpus, not the query set.
    */
  private[graft] def stage10x(s: SparkSession, base: String, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(out, "_STAGED_G2") // G2: +1x dims for the SQL-front-door keys
    if (fs.exists(marker)) return
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    def reps(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(k => f(df, k)).reduce(_ unionByName _)

    val orders = s.read.parquet(s"$base/orders.parquet")
    reps(orders, (df, k) => df.withColumn("o_orderkey", col("o_orderkey") + k * 10000000L))
      .repartition(32).write.parquet(s"$out/orders.parquet")

    val lineitem = s.read.parquet(s"$base/lineitem.parquet")
    reps(lineitem, (df, k) => df.withColumn("l_orderkey", col("l_orderkey") + k * 10000000L))
      .repartition(32).write.parquet(s"$out/lineitem.parquet")

    val docs = s.read.parquet(s"$base/documents.parquet")
    reps(docs, (df, k) => df
        .withColumn("doc_id", col("doc_id") + k * 1000000L)
        .withColumn("text",
          if (k == 0) col("text") else concat(col("text"), lit(s" rep$k"))))
      .repartition(16).write.parquet(s"$out/documents.parquet")

    val emb = s.read.parquet(s"$base/embeddings.parquet")
    val replicated = (1 until 10).map { k =>
      emb.where(col("vec_id") >= graft.pipeline.Ann.NQueries)
        .withColumn("vec_id", col("vec_id") + k * 1000000L)
    }.reduce(_ unionByName _)
    emb.unionByName(replicated)
      .repartition(16).write.parquet(s"$out/embeddings.parquet")

    // the small tables copy 1x — the SQL-front-door soak keys register
    // the WHOLE testdata catalog from the soak dir (dims/events are not
    // the scaled dimension; their absence would fail registration)
    Seq("region", "nation", "customer", "supplier", "part", "events").foreach { t =>
      s.read.parquet(s"$base/$t.parquet").write.parquet(s"$out/$t.parquet")
    }

    fs.create(marker, true).close()
  }

  /** 30× documents (the ngram family's scaled dimension); every other
    * table copies 1× so key registration works. Same remap discipline
    * as [[stage10x]]: distinct ids, suffix-distinct texts.
    */
  private def stage30x(s: SparkSession, base: String, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(out, "_STAGED_NG30")
    if (fs.exists(marker)) return
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val docs = s.read.parquet(s"$base/documents.parquet")
    (0 until 30).map(k => docs
        .withColumn("doc_id", col("doc_id") + k * 1000000L)
        .withColumn("text",
          if (k == 0) col("text") else concat(col("text"), lit(s" rep$k"))))
      .reduce(_ unionByName _)
      .repartition(32).write.parquet(s"$out/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { t =>
      s.read.parquet(s"$base/$t.parquet").write.parquet(s"$out/$t.parquet")
    }
    fs.create(marker, true).close()
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heapMax = Runtime.getRuntime.maxMemory() / (1 << 20)
    val soakDir = spark.conf.get("spark.sql.warehouse.dir") + "/soak10x"
    val soak30Dir = spark.conf.get("spark.sql.warehouse.dir") + "/soak30x"
    println(s"SOAK heap=${heapMax}MiB base=$baseDir soak=$soakDir soak30=$soak30Dir")
    stage10x(spark, baseDir, soakDir)
    stage30x(spark, baseDir, soak30Dir)

    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    val mem = ManagementFactory.getMemoryMXBean
    case class Run(key: String, scale: String, wallS: Double, taskMs: Long,
                   gcMs: Long, tasks: Long, peakHeapMb: Long, rows: Long, err: String,
                   load: Double, cpuMs: Long)
    val runs = scala.collection.mutable.ArrayBuffer.empty[Run]

    val base12 = keys ++ ngramKeys.filterNot(keys.contains)
    for (scale <- Seq("1x", "10x", "30x");
         key <- (if (scale == "30x") ngramKeys else base12)) {
      val dir = scale match {
        case "1x" => baseDir
        case "10x" => soakDir
        case _ => soak30Dir
      }
      // fixture staging (seeded lakes, PQ indexes, envelope dumps) is
      // one-time setup, not the measured operator — run once unmeasured
      try { SparkEntry.queries(key)(spark, dir).count(); () }
      catch { case _: Throwable => () }
      // One post-warmup shot proved unstable round-over-round (q33 1×
      // read 2.9s in r9 and 12.7s in r10 on identical code — JIT/GC
      // state, not the operator). Measure twice, keep the min-task run,
      // and record executorCpuTime (deschedule-immune) like Bench.
      val attempt = (0 until 2).map { _ =>
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(200)
        val load = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
        val (r0, g0, t0, c0) = listener.snap()
        val w0 = System.nanoTime()
        val res =
          try Right(SparkEntry.queries(key)(spark, dir).count())
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(300) // listener events post async
        val (r1, g1, t1, c1) = listener.snap()
        val peak = mem.getHeapMemoryUsage.getUsed / (1 << 20)
        Run(key, scale, wall, r1 - r0, g1 - g0, t1 - t0, peak,
          res.getOrElse(-1L), res.left.toOption.getOrElse(""), load, c1 - c0)
      }
      val best = attempt.minBy(r => if (r.err.nonEmpty) Long.MaxValue else r.taskMs)
      runs += best
      println(f"SOAK $scale%-3s $key%-24s wall ${best.wallS}%7.2fs task ${best.taskMs / 1000.0}%8.1fs " +
        f"cpu ${best.cpuMs / 1000.0}%8.1fs gc ${best.gcMs / 1000.0}%6.1fs tasks ${best.tasks}%5d " +
        f"heap ${best.peakHeapMb}%5dMiB load ${best.load}%4.1f " + best.err)
      spark.catalog.clearCache()
    }

    val failed = runs.filter(_.err.nonEmpty)
    val byKey = base12.map { k =>
      val one = runs.find(r => r.key == k && r.scale == "1x").get
      val ten = runs.find(r => r.key == k && r.scale == "10x").get
      (k, one, ten, if (one.taskMs > 0) ten.taskMs.toDouble / one.taskMs else -1.0)
    }
    val md = new StringBuilder
    md ++= s"# SOAK — 10× corpus under a ${heapMax}MiB heap (local[$cpus])\n\n"
    md ++= s"Corpus: $baseDir replicated 10× (orders/lineitem key-offset, texts\n"
    md ++= "suffix-distinct, embeddings re-idd with the original query set kept).\n"
    md ++= "Both scales measured in ONE JVM at the constrained heap; fixture\n"
    md ++= "staging ran unmeasured first; each cell is the min-task of two\n"
    md ++= "measured runs. cpu_ratio (executorCpuTime, deschedule-immune —\n"
    md ++= "the metric Bench gates on) ≈ 10 means linear scaling; task_ratio\n"
    md ++= "kept for round-over-round continuity (fixed per-job overheads\n"
    md ++= "pull both below 10 for short keys).\n\n"
    md ++= "| key | 1× task_ms | 10× task_ms | task_ratio | 1× cpu_ms | 10× cpu_ms | cpu_ratio | 1× wall | 10× wall | 10× gc_ms | 10× peak heap | load 1×/10× |\n"
    md ++= "|---|---|---|---|---|---|---|---|---|---|---|---|\n"
    byKey.foreach { case (k, one, ten, ratio) =>
      val cpuRatio = if (one.cpuMs > 0) ten.cpuMs.toDouble / one.cpuMs else -1.0
      md ++= f"| $k | ${one.taskMs} | ${ten.taskMs} | ${ratio}%.1f× | ${one.cpuMs} | ${ten.cpuMs} | ${cpuRatio}%.1f× | ${one.wallS}%.2fs | ${ten.wallS}%.2fs | ${ten.gcMs} | ${ten.peakHeapMb} MiB | ${one.load}%.1f/${ten.load}%.1f |\n"
    }
    if (failed.nonEmpty) {
      md ++= s"\n**FAILURES (${failed.size})**:\n"
      failed.foreach(r => md ++= s"- ${r.scale} ${r.key}: ${r.err}\n")
    } else md ++= "\nAll keys completed at both scales; no OOM, no failures.\n"

    // the ngram family's THIRD decade (r11 verdict #8): 10×→30× on a
    // 3× corpus step — cpu step ≈ 3 is linear, markedly above is a
    // steepening curve (df-cap saturation would then need a default
    // hot-bucket cap rather than a documented knob)
    val ng = ngramKeys.map { k =>
      val one = runs.find(r => r.key == k && r.scale == "1x").get
      val ten = runs.find(r => r.key == k && r.scale == "10x").get
      val thirty = runs.find(r => r.key == k && r.scale == "30x").get
      (k, one, ten, thirty)
    }
    md ++= "\n## ngram family at 30× (third scale point)\n\n"
    md ++= "| key | 1× cpu_ms | 10× cpu_ms | 30× cpu_ms | cpu 10×→30× (linear=3.0) | 30× wall | 30× gc_ms | 30× peak heap |\n"
    md ++= "|---|---|---|---|---|---|---|---|\n"
    ng.foreach { case (k, one, ten, th) =>
      val step = if (ten.cpuMs > 0) th.cpuMs.toDouble / ten.cpuMs else -1.0
      md ++= f"| $k | ${one.cpuMs} | ${ten.cpuMs} | ${th.cpuMs} | ${step}%.1f× | ${th.wallS}%.2fs | ${th.gcMs} | ${th.peakHeapMb} MiB |\n"
    }
    md ++= """
READING THE 30× STEP: the replica corpus drives shingle document
frequency with the replication factor (30 suffix-distinct copies of a
doc share almost every shingle), so the df-capped posting index sheds
exactly the buckets that grew — work per doc FALLS as replication
rises (a 10×→30× cpu step below 1.0 is the cap bounding Σdf², the
documented one-sided trade: bounded join cost, candidates lost only
among already-df-heavy boilerplate). On organic corpus growth the df
distribution is roughly scale-invariant and the family tracks the
near-linear 10× column instead; the step column exists to catch a
SUPERlinear break (step >> 3), not to read as throughput.
"""
    md ++= manifestSoak(spark)
    md ++= bloomSoak(spark, soakDir)
    md ++= concurrencySoak(spark)
    Files.write(Paths.get("SOAK.md"), md.toString.getBytes(StandardCharsets.UTF_8))
    // machine-readable twin — the per-round scale artifact of record
    // (SOAK_r{N}.json): ratio regressions gate like wall regressions
    def js(x: String) = "\"" + x + "\""
    val rows = byKey.map { case (k, one, ten, ratio) =>
      val cpuRatio = if (one.cpuMs > 0) ten.cpuMs.toDouble / one.cpuMs else -1.0
      val thirty = runs.find(r => r.key == k && r.scale == "30x").map { th =>
        val step = if (ten.cpuMs > 0) th.cpuMs.toDouble / ten.cpuMs else -1.0
        f""","cpu_ms_30x":${th.cpuMs},"task_ms_30x":${th.taskMs},""" +
          f""""cpu_step_10x_30x":$step%.2f,"wall_30x":${th.wallS}%.2f"""
      }.getOrElse("")
      js(k) + ":" + f"""{"task_ms_1x":${one.taskMs},"task_ms_10x":${ten.taskMs},""" +
        f""""task_ratio":$ratio%.2f,""" +
        f""""cpu_ms_1x":${one.cpuMs},"cpu_ms_10x":${ten.cpuMs},"cpu_ratio":$cpuRatio%.2f,""" +
        f""""wall_1x":${one.wallS}%.2f,"wall_10x":${ten.wallS}%.2f,""" +
        f""""gc_ms_10x":${ten.gcMs},"peak_heap_mb_10x":${ten.peakHeapMb},""" +
        f""""load_1x":${one.load}%.1f,"load_10x":${ten.load}%.1f,""" +
        f""""rows_10x":${ten.rows},"err":${js(ten.err)}$thirty}"""
    }.mkString("{", ",", "}")
    val sjson = s"""{"heap_mb":$heapMax,"base":${js(baseDir)},"keys":$rows,""" +
      s""""n_failed":${failed.size}}"""
    Files.write(Paths.get("soak.json"), (sjson + "\n").getBytes(StandardCharsets.UTF_8))
    println(md)
    if (failed.nonEmpty) sys.exit(1)
  }

  /** COMMIT-METADATA soak: the frequent-small-commit shape the
    * reference's streaming north star produces (Stream.hs:244-284 —
    * one commit per micro-batch, thousands of versions per day). Drives
    * 300 appends into one lake and reports what must stay FLAT for the
    * O(changed-files) delta-manifest design to hold: per-commit wall
    * (early vs late mean — O(table-files) metadata would grow it),
    * manifest bytes (late vs early), a COLD head read (fresh instance:
    * checkpoint + ≤cadence deltas, never the 300-manifest chain), and
    * one change-feed catch-up planning the full 300-version span.
    */
  /** BLOOM-INDEX soak: the point-lookup path at the 10× corpus. The
    * orders replica is hash-distributed into 64 files (the layout
    * min/max stats cannot prune), bloom-indexed at commit, and probed
    * with a 3-key IN — what must hold at scale: files OPENED tracks the
    * key count (+fpp), not the file count, and the probe's wall beats
    * the full-scan filter's. Index build cost is reported, not gated —
    * it is the one-time O(column) pass the sidecar amortizes.
    */
  private def bloomSoak(s: SparkSession, soakDir: String): String = {
    import graft.sources.Snapshots
    val root = s.conf.get("spark.sql.warehouse.dir") + "/soak_bloom/t"
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root).getParent, true)
    val snap = new Snapshots(s, root)
    val orders = s.read.parquet(s"$soakDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(64, col("o_orderkey"))
    val tb0 = System.nanoTime()
    // 0.1% fpp: a point-lookup index probing MANY files per key wants a
    // tight filter — expected false-positive opens = keys × files × fpp
    // ≈ 0.2 here, vs ~2 at the 1% default (≈1.8 bytes/row vs 1.2)
    snap.commit(Map("orders" -> orders),
      bloomCols = Map("orders" -> Seq("o_orderkey")), bloomFpp = 0.001)
    val buildS = (System.nanoTime() - tb0) / 1e9
    val keys = Seq(17L, 451L, 1063L)
    val probe = snap.readWhereIn("orders", "o_orderkey", keys)
    val total = snap.read("orders").inputFiles.length
    val opened = probe.inputFiles.length
    val tp0 = System.nanoTime()
    val hits = probe.count()
    val probeS = (System.nanoTime() - tp0) / 1e9
    val tf0 = System.nanoTime()
    val fullHits = snap.read("orders").where(col("o_orderkey").isin(keys: _*)).count()
    val fullS = (System.nanoTime() - tf0) / 1e9
    s"""
       |## Bloom-index soak (10× orders, 64 hash-distributed files)
       |
       || probe | value | verdict |
       ||---|---|---|
       || files opened / total | $opened / $total | ${if (opened <= keys.size + 3) "pruned" else "NOT PRUNED"} |
       || probe wall vs full-scan | ${f"$probeS%.2f"}s vs ${f"$fullS%.2f"}s | ${if (probeS < fullS) "faster" else "SLOWER"} |
       || rows (probe == full) | $hits == $fullHits | ${if (hits == fullHits) "exact" else "MISMATCH"} |
       |
       |Index build (commit + one column-pruned bloom pass over 10×):
       |${f"$buildS%.2f"}s, amortized across every future point lookup.
       |""".stripMargin
  }

  /** CONCURRENT-WRITER probe: 8 independent writer instances fire
    * disjoint-range deletes at ONE table simultaneously — the A30
    * merge path under real contention (no test gate). All 8 must land
    * (rebase + create-exclusive retries absorb the races), the final
    * row set must be exact, and the identity probe appends 100
    * batches whose high-water mark must advance without a gap or a
    * reissue. What this proves at the design point: same-table
    * concurrency is throughput-bound by the publish serialization, not
    * correctness-bound — the "second writer always loses" failure mode
    * is gone.
    */
  private def concurrencySoak(s: SparkSession): String = {
    import graft.sources.{FileStats, Snapshots}
    val sp = s
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val root = s.conf.get("spark.sql.warehouse.dir") + "/soak_conc/t"
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root).getParent, true)
    val snap = new Snapshots(s, root)
    val nRows = 800000L
    snap.commit(Map("t" -> s.range(1, nRows + 1).toDF("id")
      .withColumn("v", col("id") * 2.0).repartitionByRange(32, col("id"))),
      Map("t" -> Seq("id")))
    val writers = 8
    val span = nRows / writers
    val t0 = System.nanoTime()
    val tasks = (0 until writers).map { w =>
      val fut = new java.util.concurrent.FutureTask[Long](() => {
        val me = new Snapshots(s, root)
        // each writer kills the first 10k ids of its own disjoint span
        val lo = w * span + 1
        me.deleteWhere("t", Seq(FileStats.ColRange("id", Some(lo), Some(lo + 9999L))), Seq("id"))
      })
      new Thread(fut).start(); fut
    }
    val landed = tasks.count { f =>
      try { f.get(); true } catch { case _: Throwable => false }
    }
    val concS = (System.nanoTime() - t0) / 1e9
    val got = snap.read("t").count()
    val expect = nRows - writers * 10000L
    // identity probe: 100 sequential lake-assigned batches
    snap.commitSerializable(Map("ids" -> Seq((0L, "seed")).toDF("id", "s")),
      readSet = Set.empty, baseVersion = snap.currentVersion.get) // merge next to t
    snap.addIdentity("ids", "id")
    val n = 100
    val iw = (1 to n).map { i =>
      val t1 = System.nanoTime()
      snap.appendIdentity("ids", Seq(s"b$i").toDF("s"))
      (System.nanoTime() - t1) / 1e6
    }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val iEarly = mean(iw.slice(10, 50)); val iLate = mean(iw.takeRight(40))
    val idsDistinct = snap.read("ids").select("id").distinct().count()
    val idsN = snap.read("ids").count()
    val hw = snap.identityColumn("ids").get._2
    s"""
       |## Concurrency soak (8 racing writers, one table)
       |
       || probe | value | verdict |
       ||---|---|---|
       || disjoint deletes landed | $landed / $writers in ${f"$concS%.1f"}s | ${if (landed == writers) "all merged" else "LOST WORK"} |
       || rows after the storm | $got (expected $expect) | ${if (got == expect) "exact" else "MISMATCH"} |
       || identity appends ($n sequential) | ${f"$iEarly%.0f"} ms early / ${f"$iLate%.0f"} ms late | ${if (iLate < iEarly * 2) "flat" else "GROWING"} |
       || identity ids unique / mark | $idsDistinct of $idsN, next=$hw | ${if (idsDistinct == idsN && hw == idsN.toLong) "exact" else "MISMATCH"} |
       |""".stripMargin
  }

  private def manifestSoak(s: SparkSession): String = {
    import graft.sources.Snapshots
    val sp = s
    import sp.implicits._
    val root = s.conf.get("spark.sql.warehouse.dir") + "/soak_manifest/t"
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root).getParent, true)
    val snap = new Snapshots(s, root)
    snap.commit(Map("t" -> Seq((0L, 0.0)).toDF("id", "v")))
    val n = 300
    val walls = (1 to n).map { i =>
      val t0 = System.nanoTime()
      snap.append("t", Seq((i.toLong, i * 1.0)).toDF("id", "v"))
      (System.nanoTime() - t0) / 1e6
    }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    // skip the first 10 appends: JIT/stage warmup inflates them, and an
    // inflated early baseline would let a real O(files) growth print as
    // "flat" — the probe must be able to fail
    val early = mean(walls.slice(10, 60)); val late = mean(walls.takeRight(50))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def mlen(v: Long) = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      root + "/_commits", f"$v%020d.manifest")).getLen
    val head = snap.currentVersion.get
    val tCold0 = System.nanoTime()
    val coldCount = new Snapshots(s, root).read("t").count()
    val coldS = (System.nanoTime() - tCold0) / 1e9
    val ckpt = Files.createTempDirectory("soakcf").toString
    val tFeed0 = System.nanoTime()
    val q = s.readStream.format("graft.sources.ChangeFeed")
      .option("path", root).option("table", "t").option("startingVersion", "0")
      .load().groupBy().count()
      .writeStream.format("memory").queryName("soak_feed")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val feedS = (System.nanoTime() - tFeed0) / 1e9
    val feedRows = s.table("soak_feed").head().getLong(0)
    // GUARDED-WRITE probe: the same small-append stream against a table
    // carrying 2 CHECK constraints + 1 generated column. What must hold
    // for the write-time contracts to be usable on a streaming lake:
    // the per-commit enforcement cost is a flat O(batch) constant (one
    // extra aggregate job + the derivation projection), independent of
    // the table's accumulated size and version count.
    snap.append("g", Seq((0L, 0.0, 0.0)).toDF("id", "v", "v2"))
    snap.addCheck("g", "v_pos", "v >= 0")
    snap.addCheck("g", "id_nn", "id IS NOT NULL")
    snap.addGenerated("g", "v2", "v * 2")
    val gn = 100
    val gwalls = (1 to gn).map { i =>
      val t0 = System.nanoTime()
      snap.append("g", Seq((i.toLong, i * 1.0)).toDF("id", "v")) // v2 computed
      (System.nanoTime() - t0) / 1e6
    }
    val gEarly = mean(gwalls.slice(10, 50)); val gLate = mean(gwalls.takeRight(40))
    s"""
       |## Commit-metadata soak ($n appends, one lake)
       |
       || probe | early | late | verdict |
       ||---|---|---|---|
       || commit wall (mean of 50) | ${f"$early%.0f"} ms | ${f"$late%.0f"} ms | ${if (late < early * 2) "flat" else "GROWING"} |
       || manifest bytes | ${mlen(2L)} (v2) | ${mlen(head)} (v$head) | ${if (mlen(head) < mlen(2L) * 4) "flat" else "GROWING"} |
       || guarded append wall (2 checks + 1 generated, mean of 40) | ${f"$gEarly%.0f"} ms | ${f"$gLate%.0f"} ms | ${if (gLate < gEarly * 2) "flat" else "GROWING"} |
       |
       |Cold head read after $head versions (fresh instance, checkpoint +
       |<=16 deltas): ${f"$coldS%.2f"}s for $coldCount rows. Change-feed catch-up
       |over the whole $head-version span: ${f"$feedS%.2f"}s end-to-end,
       |$feedRows change rows delivered.
       |""".stripMargin
  }
}
