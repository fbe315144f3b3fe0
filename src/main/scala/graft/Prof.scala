package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage cpu attribution for one or more bench keys — the r12
  * optimization round's measurement harness (guide §1: measure first).
  *
  * Runs each key once warm (codegen/footers), then once instrumented,
  * and prints every stage of the timed run with its executor cpu/run
  * time and the first graft frame of its call site, so the expensive
  * operator inside a multi-stage pipeline is named instead of guessed.
  *
  * Usage: SPARK_GRAFT_PROF_KEYS=d14_dedup_containment sbt "runMain graft.Prof"
  */
object Prof {

  private final class StageListener extends SparkListener {
    final case class Row(id: Int, name: String, site: String, tasks: Int,
                         runMs: Long, cpuMs: Long, shuffleReadMB: Double,
                         shuffleWriteMB: Double, records: Long)
    val rows = mutable.ArrayBuffer.empty[Row]
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      val site = si.details.linesIterator
        .find(l => l.contains("graft.") && !l.contains("graft.Prof"))
        .getOrElse("").trim.take(120)
      rows += Row(si.stageId, si.name.take(60), site, si.numTasks,
        m.executorRunTime, m.executorCpuTime / 1000000,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val keys = sys.env.getOrElse("SPARK_GRAFT_PROF_KEYS", "d14_dedup_containment")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.builder(cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    keys.foreach { key =>
      val q = SparkEntry.queries(key)
      // TWO warm passes: the first builds operator caches, the second is
      // the steady state the bench's converged-min reports. The timed,
      // instrumented pass below then matches the bench's best run.
      try { q(spark, sfDir).count(); q(spark, sfDir).count() }
      catch { case e: Throwable => println(s"[prof] $key warm FAILED: ${e.getMessage}") }
      System.gc() // match the bench's once() protocol: prior runs' garbage
      Thread.sleep(150) // must not bill its collection to the timed window
      val l = new StageListener
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      if (sys.env.contains("SPARK_GRAFT_PROF_PLAN"))
        println(s"=== $key FINAL PLAN ===\n" + df.queryExecution.executedPlan.toString.take(20000))
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(l)
      spark.catalog.clearCache()
      println(f"%n=== $key wall=$wall%.2fs totalCpu=${l.rows.map(_.cpuMs).sum / 1000.0}%.2fs totalRun=${l.rows.map(_.runMs).sum / 1000.0}%.2fs stages=${l.rows.size} ===")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"cpu_s"}%8s ${"run_s"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"recs"}%10s  site")
      l.rows.sortBy(-_.cpuMs).take(25).foreach { r =>
        println(f"${r.id}%6d ${r.tasks}%5d ${r.cpuMs / 1000.0}%8.2f ${r.runMs / 1000.0}%8.2f ${r.shuffleReadMB}%8.2f ${r.shuffleWriteMB}%8.2f ${r.records}%10d  ${r.site}")
      }
    }
    spark.stop()
  }
}
