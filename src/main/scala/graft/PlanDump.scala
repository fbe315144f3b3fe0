package graft

import java.nio.file.{Files, Paths}

/** Per-key formatted-plan dump for the optimization-round evidence
  * files (`plans/r<N>/<key>_{before,after}.txt`).
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <k1,k2,...>"`
  * — writes `<outDir>/<key>_<suffix>.txt` with the FORMATTED plan (the
  * analyzed plan's physical translation; fixture staging runs first so
  * staged-index reads resolve like they do in the bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "PlanDump <sfDir> <outDir> <suffix> <keys,comma-sep>")
    val Array(sfDir, outDir, suffix, keyCsv) = args
    val keys = keyCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.local(8)
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { name =>
      val fn = SparkEntry.queries(name)
      // run once so marker-gated fixtures stage and AQE-relevant caches
      // exist, then re-plan fresh for the dump
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
