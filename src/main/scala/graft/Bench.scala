package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver.
  */
object Bench {

  /** Representative, scale-stressing subset (full suite runs in Verify):
    * scan+agg, shuffles, broadcast + shuffle joins, windows, arrays,
    * as-of/range custom operators, CDC apply, stream-window twin.
    */
  val headline: Seq[String] = Seq(
    "q01_agg", "q02_filter_project", "q03_join_flagship", "q04_join_broadcast",
    "q07_join_outer", "q08_window", "q09_topk", "q16_array",
    "q19_sessionize", "q21_asof_join", "q22_range_join",
    "c01_cdc_apply", "st01_stream_window")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = headline.filter(SparkEntry.queries.contains)
    // Warm-up pass (JVM/codegen warm, parquet footers cached) — we
    // measure steady-state engine throughput, not JIT warmup.
    qs.take(2).foreach(n => SparkEntry.queries(n)(spark, sfDir).count())

    val results = qs.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
