package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.functions.{cosine_sim, minhash_sig, simhash64 => simhash64c, sorted_intersect_count}

/** Deduplication family (SURVEY §2 C1-C5).
  *
  * Scale doctrine: candidate generation is ALWAYS an equi-join on a
  * derived key (hash bucket, LSH band, shared shingle) — a linear
  * shuffle — never an O(n²) pair enumeration. Exact similarity is then
  * computed only on candidates. At 100 TB the only knobs are band/bank
  * width (bucket fan-out) and a hot-bucket cap; the plan shape is fixed.
  *
  * The narrow derived signature tables (LSH bands, SimHash banks —
  * pure long columns) are persisted MEMORY_AND_DISK: each feeds both
  * self-join sides, the columnar cache of longs is near-free, and at
  * 100 TB they are exactly what you'd materialize to a staging table.
  * Array-typed intermediates (shingle sets) are NOT cached — the
  * columnar cache round-trip of array rows measured slower than
  * recomputing them per consumer. CacheManager dedupes by canonicalized
  * plan, so repeated calls share one cache entry.
  */
object Dedup {

  /** C1: exact dedup by content hash. The input is the corpus unioned
    * with an id-shifted copy of itself so the duplicate-elimination path
    * is actually exercised (a pass on a dup-free corpus would be
    * vacuous): every text occurs exactly twice and the operator must
    * keep the minimum id. One shuffle on md5(text) with map-side
    * partial agg; at 100 TB the hash groupBy is the canonical
    * linear-shuffle exact dedup.
    */
  def d01DedupExact(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val shifted = base.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    base.union(shifted)
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("text_md5"), col("n_copies"))
      .orderBy("keep_id")
  }

  /** C2: MinHash+LSH near-dup. shingle → 128-perm MinHash signature
    * (custom codegen expression) → 16 bands × 8 rows → band-hash
    * equi-join generates candidates → exact Jaccard on the candidate
    * pairs only. Banding theory: a pair with Jaccard j collides in ≥1
    * band with prob 1-(1-j^8)^16 — ≈0.99 at j=0.8, ≈0.004 at j=0.3,
    * so the join stays linear while recall at the 0.5 threshold is high.
    * Output is exact Jaccard (deterministic), verified by DedupSpec
    * against brute-force pairs at sf0.001.
    */
  def d02DedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val base = shingled(s, dir)
    // sig inline over the toks attribute; band hashes inline under the
    // posexplode (see pipeline.shingled perf note on Generate)
    val bands = tokenized(s, dir)
      .select(col("doc_id"), minhash_sig(wordTrigrams(col("toks")), 128).as("sig"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> " +
            "aggregate(slice(sig, b*8+1, 8), cast(42 as bigint), (acc, x) -> xxhash64(acc, x)))")))
      .toDF("doc_id", "band_idx", "band_hash")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(base.toDF("a_id", "a_sh"), "a_id")
      .join(base.toDF("b_id", "b_sh"), "b_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .where(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** C3: SimHash near-dup. 64-bit SimHash of the shingle set (custom
    * codegen expression); candidate pairs via 8 banks × 8 bits — by
    * pigeonhole any pair with Hamming distance ≤ 7 shares at least one
    * intact bank, so the bank equi-join is a *complete* candidate
    * generator for hd ≤ 7 (then filtered exactly with bit_count(xor)).
    * 8-bit banks are coarse (256 values); at 100 TB widen banks and/or
    * cap hot buckets — the guarantee degrades gracefully to recall.
    */
  def d03DedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val hashed = shingled(s, dir)
      .select(col("doc_id"), simhash64c(col("sh")).as("sh64"))
    val banks = hashed.select(col("doc_id"), col("sh64"),
        posexplode(expr(
          "transform(sequence(0, 7), b -> (shiftright(sh64, b*8) & 255))")))
      .toDF("doc_id", "sh64", "bank_idx", "bank_val")
      .persist(StorageLevel.MEMORY_AND_DISK)
    banks.as("a").join(banks.as("b"),
        col("a.bank_idx") === col("b.bank_idx") &&
          col("a.bank_val") === col("b.bank_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh64").bitwiseXOR(col("b.sh64"))).cast("long").as("hamming"))
      .where(col("hamming") <= 7) // filter BEFORE distinct: losers must not ride the dedup shuffle
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** C4: exact n-gram Jaccard via a shingle-hash inverted index.
    * Shingle strings hash to xxhash64 longs up front, so the hot join
    * carries 16-byte (doc_id, hash) rows and the pair aggregation keys
    * on longs (exact modulo 64-bit collisions — p ≈ 1e-15 per pair on
    * this corpus; the DuckDB string oracle agrees). The shared-hash
    * equi-join + groupBy count IS the exact intersection; per-doc set
    * sizes re-attach afterwards via a narrow broadcast so no extra
    * payload rides the Σdf² pair explosion. SHUFFLE_HASH pins the
    * candidate join away from AQE's sort-merge fallback (sorting
    * exploded postings measured 6x slower).
    *
    * (A PPJoin prefix-filter variant was tried and reverted: with a
    * hash canonical order, globally frequent shingles that draw small
    * hashes land in most docs' prefixes, creating hot posting lists —
    * the frequency-ordered prefix it needs costs an extra global df
    * pass. The plain inverted index is stable and linear.)
    */
  def d04DedupNgram(s: SparkSession, dir: String): DataFrame = {
    val thr = 0.6
    val hashes = transform(wordTrigrams(col("toks")), x => xxhash64(x))
    val inv = tokenized(s, dir).select(col("doc_id"), explode(hashes).as("h"))
    val sizes = tokenized(s, dir).select(col("doc_id"), size(hashes).as("n_sh"))
    inv.toDF("a_id", "h").hint("SHUFFLE_HASH")
      .join(inv.toDF("b_id", "h"), Seq("h"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.toDF("a_id", "a_n")), "a_id")
      .join(broadcast(sizes.toDF("b_id", "b_n")), "b_id")
      .withColumn("jaccard", col("inter") / (col("a_n") + col("b_n") - col("inter")))
      .where(col("jaccard") >= thr)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** C5: embedding cosine near-dup, exact. The corpus embeddings table
    * is self-joined with the smaller side broadcast (no shuffle) and the
    * cosine runs inside codegen (custom expression). Exact all-pairs is
    * the *bounded-set* variant — at 100 TB the scale path is s02's LSH
    * buckets (recall<1); this operator is what you run on a shard or a
    * candidate pool. DuckDB list_cosine_similarity oracle.
    */
  def d05DedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val a = e.toDF("a_id", "a_vec")
    val b = e.toDF("b_id", "b_vec")
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("cos", cosine_sim(col("a_vec"), col("b_vec")))
      .where(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("a_id", "b_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_dedup_exact" -> d01DedupExact _,
    "d02_dedup_minhash" -> d02DedupMinhash _,
    "d03_dedup_simhash" -> d03DedupSimhash _,
    "d04_dedup_ngram" -> d04DedupNgram _,
    "d05_dedup_embedding" -> d05DedupEmbedding _)

  /** d02/d03 are rows-only (MinHash/SimHash aren't ANSI-SQL
    * expressible); DedupSpec carries their recall/exactness checks.
    */
  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents
        |)
        |SELECT min(doc_id) AS keep_id, md5(text) AS text_md5, count(*) AS n_copies
        |FROM u GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d04_dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)
        |), sz AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
        |), p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id,
        |  round(inter / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
        |FROM p
        |JOIN sz sa ON a_id = sa.doc_id
        |JOIN sz sb ON b_id = sb.doc_id
        |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.6
        |ORDER BY a_id, b_id""".stripMargin,
    "d05_dedup_embedding" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a
        |JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin)
}
