package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory — the engine's entry point.
  *
  * Analog of the reference's connection layer
  * (reference: src/Database/PostgreSQL/Stream/Connection.hs:29-71):
  * where pgstream opens a pooled libpq connection, a Spark engine opens a
  * session. Pooling/stripes have no analog — Spark owns executor
  * lifecycle; the tuning knobs that matter at 100 TB are shuffle
  * parallelism, AQE (runtime re-plan, skew-join splitting) and a stable
  * UTC session timezone for deterministic timestamp semantics.
  */
object GraftSession {

  /** Defaults chosen for the local[32] harness; on a real cluster the
    * same builder is used with master/memory set by spark-submit and
    * shuffle.partitions sized to ~2-3x total cores.
    */
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName("graft")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing is byte-based; the pipeline's candidate-pair
      // stages are CPU-dense at tiny byte sizes (16-byte pair rows
      // carrying an array-intersection each), and the 1MB default
      // collapsed them to 1-4 tasks on a 32-core box. 64k keeps
      // compute parallelism; at real scale partitions are byte-bound
      // far above either threshold, so this only affects small inputs.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // Constraint propagation re-derives predicates over computed
      // columns and pushes them below repartitions with the expression
      // inlined — for the pipeline's shingle/hash columns that meant
      // minutes of serial re-evaluation in the one-split scan task (and
      // the inferred filters are redundant here: inputs are non-null).
      // The cost of disabling is the loss of inferred isnotnull join
      // filters, which only matter for null-heavy keys.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Always use the serialized (Unsafe) shuffle writer. The default
      // bypass-merge writer kicks in below 200 reduce partitions and
      // opens one buffered+compressed stream PER PARTITION per map task
      // — JFR showed that stream setup (BufferedOutputStream + LZ4
      // block buffers) was ~40% of executor cpu across the suite, a
      // pure per-task constant. The Unsafe writer buffers rows in
      // pooled task memory, radix-sorts by partition id, and writes one
      // file per spill — which is exactly the writer every >200-
      // partition shuffle on a real cluster uses anyway, so local
      // behavior now matches the at-scale path (measured: d07 cpu
      // 16.8s → 2.2s, d01 2.2s → 0.5s, same plans).
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      // managed (bucketed) staging tables go to a scratch warehouse
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no type
      // for; read as Long (ns since epoch) and convert explicitly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ANSI TIME is feature-flagged in Spark 4.1; the typed-decode
      // surface (q31) maps the reference's `time` column type onto it.
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Spark still writes INT96 timestamps by default — a legacy
      // physical type with NO footer statistics, so a timestamp column
      // could never participate in stats-sidecar file skipping (or
      // parquet row-group pruning). TIMESTAMP_MICROS is the standard
      // annotated INT64 form every modern reader speaks, stats
      // included; at 100 TB, time-range scans live or die on this.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Static conf, must precede session creation. The default 100-entry
      // codegen class cache evicts constantly under a multi-query workload
      // (the 49-key bench suite alone compiles several hundred stages), so
      // a key re-run after other keys recompiles every one of its stages
      // inside its own timed window. A long-lived analytics session is
      // exactly this workload; the cache holds class references, not data.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val s = builder(cores).master(s"local[$cores]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
