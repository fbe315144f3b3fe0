package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** CORE-SCALING bench: the top-cpu keys at the 10× corpus under BOTH 32
  * and 8 cores, in one process (sessions recreated per core count).
  *
  * Why it exists (r12 verdict #6): at sf0.1 the whole suite is per-task-
  * overhead and fixture-latency bound — the driver's own 8-core run beat
  * its 32-core run, so the low/high ratio at that scale measures nothing.
  * Parallelism only becomes observable when per-key work dominates the
  * constants, which is what the 10× corpus provides. A data-parallel key
  * should show wall(8) / wall(32) well above 1 (→ 4 at perfect scaling
  * minus Amdahl constants); cpu should stay ~flat across core counts
  * (same work, different concurrency).
  *
  * Usage: `sbt "runMain graft.ScaleBench"` — writes SCALING.md +
  * scaling.json. SPARK_GRAFT_SF_DIR picks the 1× base corpus the 10×
  * replica derives from; SPARK_GRAFT_SCALE_KEYS overrides the key list.
  */
object ScaleBench {

  /** The bench's heaviest cpu keys that are genuinely data-parallel
    * (scan/shuffle/kernel bound). Deliberately excluded: the SQL-
    * lifecycle/streaming keys whose wall is driver-sequenced fixture DDL
    * and micro-batch trigger latency — their scaling story is the
    * commit protocol's, not the executor pool's.
    */
  val defaultKeys: Seq[String] = Seq(
    "d08_dedup_incremental_ngram", "d04_dedup_ngram", "d14_dedup_containment",
    "q33_profile", "q33_profile_approx", "q20_salted_join",
    "t19_substring_dedup", "q31_typed_wide", "p01_pipeline_e2e",
    "c02_cdc_apply_unsorted", "t17_bm25", "s13_ann_sq8")

  private final class MetricsListener extends SparkListener {
    val cpuMs = new AtomicLong; val runMs = new AtomicLong; val tasks = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        runMs.addAndGet(m.executorRunTime)
        tasks.incrementAndGet()
      }
    }
    def snap(): (Long, Long, Long) = (cpuMs.get, runMs.get, tasks.get)
  }

  final case class Cell(wallS: Double, cpuMs: Long, taskMs: Long, tasks: Long, err: String)

  private def runKeys(cores: Int, dir: String, keys: Seq[String]): Map[String, Cell] = {
    val spark = GraftSession.builder(cores).master(s"local[$cores]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = keys.map { key =>
      // fixture staging + codegen warm, unmeasured
      try { SparkEntry.queries(key)(spark, dir).count(); () }
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val runs = (0 until 2).map { _ =>
        System.gc(); Thread.sleep(150)
        val (c0, r0, t0) = listener.snap()
        val w0 = System.nanoTime()
        val err =
          try { SparkEntry.queries(key)(spark, dir).count(); "" }
          catch { case e: Throwable => s"${e.getClass.getSimpleName}: ${e.getMessage}".take(160) }
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(200)
        val (c1, r1, t1) = listener.snap()
        spark.catalog.clearCache()
        Cell(wall, c1 - c0, r1 - r0, t1 - t0, err)
      }
      val best = runs.minBy(c => if (c.err.nonEmpty) Double.MaxValue else c.wallS)
      println(f"SCALE local[$cores%2d] $key%-28s wall ${best.wallS}%7.2fs cpu ${best.cpuMs / 1000.0}%7.1fs tasks ${best.tasks}%5d ${best.err}")
      key -> best
    }.toMap
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    out
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keys = sys.env.get("SPARK_GRAFT_SCALE_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultKeys)
      .filter(SparkEntry.queries.contains)
    // stage the 10× corpus with a full-width session, then measure
    val stager = GraftSession.builder(32).master("local[32]").getOrCreate()
    stager.sparkContext.setLogLevel("WARN")
    val dir10 = stager.conf.get("spark.sql.warehouse.dir") + "/soak10x"
    Soak.stage10x(stager, baseDir, dir10)
    stager.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val hi = runKeys(32, dir10, keys)
    val lo = runKeys(8, dir10, keys)

    val md = new StringBuilder
    md ++= "# CORE SCALING — top-cpu keys at the 10× corpus, local[32] vs local[8]\n\n"
    md ++= "wall(8)/wall(32) >> 1 = the key parallelizes (4.0 = perfect over the\n"
    md ++= "core ratio); ≈1 = constant-bound at this scale. cpu should stay ~flat\n"
    md ++= "(same work, different concurrency); a cpu(8) << cpu(32) means cache/SMT\n"
    md ++= "contention inflated the 32-core cycles, not that the plan changed.\n\n"
    md ++= "| key | wall 32c | wall 8c | wall 8c/32c | cpu 32c | cpu 8c | tasks 32c |\n"
    md ++= "|---|---|---|---|---|---|---|\n"
    val rows = keys.map { k =>
      val h = hi(k); val l = lo(k)
      val ratio = if (h.wallS > 0) l.wallS / h.wallS else -1.0
      md ++= f"| $k | ${h.wallS}%.2f | ${l.wallS}%.2f | $ratio%.2f× | ${h.cpuMs / 1000.0}%.1f | ${l.cpuMs / 1000.0}%.1f | ${h.tasks} |\n"
      val err = if (h.err.nonEmpty) h.err else l.err
      s""""$k":{"wall_32":${f"${h.wallS}%.3f"},"wall_8":${f"${l.wallS}%.3f"},""" +
        s""""ratio_8_over_32":${f"$ratio%.3f"},"cpu_ms_32":${h.cpuMs},"cpu_ms_8":${l.cpuMs},""" +
        s""""tasks_32":${h.tasks},"err":"${err.replace("\"", "'")}"}"""
    }
    val json = s"""{"corpus":"$dir10","cpus_high":32,"cpus_low":8,""" +
      s""""keys":${rows.mkString("{", ",", "}")}}"""
    Files.write(Paths.get("SCALING.md"), md.toString.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get("scaling.json"), (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(md)
  }
}
