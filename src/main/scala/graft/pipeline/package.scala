package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (SURVEY §2C): dedup, similarity
  * search, text analysis, multimodal plumbing — the operations a
  * 100 TB LLM-corpus build runs on top of the relational engine.
  *
  * Shared column builders live here so every operator tokenizes and
  * shingles identically (and identically to the DuckDB oracles).
  */
package object pipeline {

  /** Parquet read with a small-input parallelism guard. A 100 TB corpus
    * arrives as thousands of row-group splits and inherits scan
    * parallelism for free; a single small file is ONE split, which
    * serializes every downstream shingle/hash/vector kernel into one
    * task (measured: the whole dedup pipeline pinned to 1 of 32 cores).
    * Fanning a tiny input out is a sub-millisecond shuffle; at scale the
    * guard never fires.
    */
  private def readSpread(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val target = s.sparkContext.defaultParallelism
    // (constraint propagation is disabled in GraftSession — with it on,
    // inferred isnotnull filters over computed columns get pushed below
    // this repartition into the single-split scan task with the full
    // expression inlined.)
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  def docs(s: SparkSession, dir: String): DataFrame =
    readSpread(s, s"$dir/documents.parquet")

  def emb(s: SparkSession, dir: String): DataFrame =
    readSpread(s, s"$dir/embeddings.parquet")

  /** Whitespace tokens — single-space corpus; split(' ') matches
    * DuckDB string_split(text, ' ') exactly.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-gram shingles. Declarative (sequence+transform stay
    * native expressions — no UDF); guarded because Spark's sequence(1, 0)
    * counts *down* while DuckDB's generate_series(1, 0) is empty.
    *
    * IMPORTANT: pass a *materialized* tokens column (an attribute), not
    * `tokens(...)` inline — subexpression elimination does not reach
    * inside higher-order-function lambdas, so an inline split would be
    * re-evaluated for every element_at of every shingle (measured ~3x
    * slowdown on the dedup suite). [[shingled]] does this correctly.
    */
  def wordTrigrams(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** documents with a materialized `toks` column. Downstream shingle
    * expressions reference the attribute, so the split runs once per row.
    */
  def tokenized(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("toks", tokens(col("text")))

  /** (doc_id, sh) for array consumers (set intersection, MinHash input).
    *
    * PERF NOTE for explode consumers: explode the INLINE expression
    * (`explode(wordTrigrams(col("toks")))` over [[tokenized]]), never
    * this `sh` attribute — Generate over an attribute produced by a
    * non-collapsed projection re-evaluates the projection per output
    * element (measured 8s vs 0.75s on 260k shingles at sf0.1).
    */
  def shingled(s: SparkSession, dir: String): DataFrame =
    tokenized(s, dir)
      .select(col("doc_id"), wordTrigrams(col("toks")).as("sh"))

  /** Byte budget under which a pipeline operator may PIN a broadcast
    * join side (guide §3.1: explicit hints where estimates are known
    * wrong, but never unbounded). 64 MB default — comfortably inside
    * executor/driver memory at any deployment size; production tunes it
    * via conf. Sides over budget fall back to shuffle strategies.
    */
  def broadcastMaxBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.broadcastMaxBytes")
      .map(_.toLong).getOrElse(64L << 20)
}
