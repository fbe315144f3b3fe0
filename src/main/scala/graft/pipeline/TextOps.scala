package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Text analysis operators (SURVEY §2 C8-C11): language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All four are pure column expressions over builtins — fully inside
  * whole-stage codegen, no UDFs, no shuffle except the final
  * deterministic ORDER BY (which exists only for the oracle compare; the
  * pipeline form is the unsorted projection). At 100 TB these run at
  * parquet scan speed with the `text` column as the only wide read.
  */
object TextOps {

  private[pipeline] val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
  private val deStops = Seq("der", "die", "das", "und", "ist", "nicht")
  private val frStops = Seq("le", "les", "et", "est", "une", "dans")
  private val esStops = Seq("el", "los", "las", "es", "y", "una")

  // r13: one-pass kernel — the builtin form
  // `size(filter(toks, isin(stops)))` materialized a filtered array per
  // evaluation, and the language scorer runs four of these per row
  // (count-identical incl. null tokens; pinned in TextSpec)
  private[pipeline] def stopCount(toks: Column, stops: Seq[String]): Column =
    graft.functions.functions.stop_count(toks, stops)

  /** C8: language ID via stopword evidence — the classic cheap n-gram
    * heuristic's first stage, chosen because it is expressible
    * identically in ANSI SQL (the DuckDB oracle runs the same scoring),
    * making correctness machine-checkable. Tie-break priority is fixed
    * (en > de > fr > es); docs with zero evidence → 'und'. TextSpec
    * additionally property-tests real multilingual snippets.
    */
  def t01LangId(s: SparkSession, dir: String): DataFrame =
    langIdFrame(docs(s, dir))

  /** The scoring itself over any (doc_id, text) frame — TextSpec runs it
    * on real multilingual snippets.
    */
  def langIdFrame(in: DataFrame): DataFrame = {
    // materialized: four stopCounts each walk the array; splitting once
    // per row, not once per scoring expression (see wordTrigrams note)
    val toks = col("toks")
    in
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        stopCount(toks, enStops).as("en_n"),
        stopCount(toks, deStops).as("de_n"),
        stopCount(toks, frStops).as("fr_n"),
        stopCount(toks, esStops).as("es_n"))
      .withColumn("pred_lang",
        when(col("en_n") >= col("de_n") && col("en_n") >= col("fr_n") &&
          col("en_n") >= col("es_n") && col("en_n") > 0, "en")
          .when(col("de_n") >= col("fr_n") && col("de_n") >= col("es_n") &&
            col("de_n") > 0, "de")
          .when(col("fr_n") >= col("es_n") && col("fr_n") > 0, "fr")
          .when(col("es_n") > 0, "es")
          .otherwise("und"))
      .orderBy("doc_id")
  }

  /** The t01 classifier as ONE scalar over raw text — the SQL-function
    * form (`lang_id(text)`, registered by GraftExtensions). Codegen
    * CSE evaluates the repeated split subtree once; TextSpec pins
    * equality with [[langIdFrame]]'s pred_lang.
    */
  def langIdCol(text: Column): Column = {
    val toks = tokens(text)
    val en = stopCount(toks, enStops); val de = stopCount(toks, deStops)
    val fr = stopCount(toks, frStops); val es = stopCount(toks, esStops)
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** The t02 linear quality blend as one scalar (`quality_score(text)`
    * in SQL) — a pushable per-row predicate input at any scale.
    */
  def qualityScoreCol(text: Column): Column = {
    val toks = tokens(text)
    val nWords = size(toks)
    val nDistinct = graft.functions.functions.distinct_tokens(toks)
    val nStop = stopCount(toks, enStops)
    round(lit(0.4) * (nDistinct * lit(1.0) / nWords) +
      lit(0.4) * (lit(1.0) - nStop * lit(1.0) / nWords) +
      lit(0.2) * least(nWords * lit(1.0) / 100.0, lit(1.0)), 4)
  }

  /** t03's whitespace token count as one scalar (`token_count(text)`). */
  def tokenCountCol(text: Column): Column =
    size(split(trim(text), " +")).cast("long")

  /** t04's normalized content fingerprint (`doc_fingerprint(text)`).
    * r13: the collapse step runs as the one-pass normalize_alnum kernel
    * — byte-identical to the two-regex + trim ladder (pinned in
    * TextSpec incl. multibyte/space-run edge inputs), which measured
    * 5.6-6.7 cpu-s alone on the sf0.1 corpus. lower() and md5() stay
    * the builtins.
    */
  def fingerprintCol(text: Column): Column =
    md5(graft.functions.functions.normalize_alnum(lower(text)).cast("binary"))

  /** C9: document quality scoring — length, lexical diversity, stopword
    * density, word-length shape. The score is a fixed linear blend, so
    * filtering `quality >= θ` is a plain pushable predicate at scale.
    */
  def t02QualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    docs(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        size(toks).cast("long").as("n_words"),
        graft.functions.functions.distinct_tokens(toks).cast("long").as("n_distinct"),
        stopCount(toks, enStops).as("n_stop"))
      .withColumn("avg_word_len",
        round(((col("len_chars") - col("n_words") + 1L) * lit(1.0)) / col("n_words"), 4))
      .withColumn("distinct_ratio", round(col("n_distinct") * lit(1.0) / col("n_words"), 4))
      .withColumn("stop_ratio", round(col("n_stop") * lit(1.0) / col("n_words"), 4))
      .withColumn("quality",
        round(lit(0.4) * (col("n_distinct") * lit(1.0) / col("n_words")) +
          lit(0.4) * (lit(1.0) - col("n_stop") * lit(1.0) / col("n_words")) +
          lit(0.2) * least(col("n_words") * lit(1.0) / 100.0, lit(1.0)), 4))
      .orderBy("doc_id")
  }

  /** C10: token counting — whitespace tokens plus a BPE-ish regex pass
    * ([a-z]+ | digit runs | single punctuation), the standard cheap
    * proxy for LLM token budgets. regexp_extract_all is a native
    * codegen'd expression; the pattern is RE2-and-Java compatible so
    * the oracle tokenizes identically.
    */
  def t03TokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("len_chars"))
      .withColumn("chars_per_token",
        round(col("len_chars") * lit(1.0) / col("ws_tokens"), 4))
      .orderBy("doc_id")

  /** C11: content fingerprint — normalize (lower, strip non-alnum,
    * collapse whitespace) then md5. The normalized-hash groupBy is the
    * near-exact dedup key used before the fuzzier MinHash passes; a
    * rolling-hash shingle variant is exercised in TextSpec.
    */
  def t04Fingerprint(s: SparkSession, dir: String): DataFrame =
    fingerprintFrame(docs(s, dir))

  /** Fingerprint over any (doc_id, text) frame — TextSpec checks the
    * normalization equivalences (case, punctuation, whitespace).
    */
  def fingerprintFrame(in: DataFrame): DataFrame =
    in
      .select(col("doc_id"),
        fingerprintCol(col("text")).as("fingerprint"),
        length(col("text")).cast("long").as("len_chars"))
      .orderBy("doc_id")

  /** C14: deterministic train/val/test split — content-hash bucketing
    * (first md5 hex digit: 12/16 train, 2/16 val, 2/16 test), so the
    * assignment is stable under reshuffles, re-runs and corpus growth —
    * the property random sampling lacks. Pure projection + one small
    * aggregate; stratification is just the (split, lang) breakdown.
    */
  def t05TrainSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("bucket", substring(md5(col("text").cast("binary")), 1, 1))
      .withColumn("split",
        when(col("bucket") < "c", "train")
          .when(col("bucket").isin("c", "d"), "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars_total"))
      .orderBy("split", "lang")

  /** C15: sequence packing — contiguous token-budget partitioning of
    * each source shard into ~512-token packs (the pre-tokenization
    * grouping step of LLM batch assembly). pack_id derives from a
    * running token sum windowed per source, so packing parallelizes
    * across shards (one shuffle on `source`) instead of a global
    * sequential fold; within a shard, doc order is the deterministic
    * doc_id order.
    */
  def t06Pack(s: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, dir)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
      .select("source", "doc_id", "n_tokens", "pack_id")
      .orderBy("source", "doc_id")
  }

  /** C52 `t24_shard_pack`: SHARD layout — assign the corpus to
    * size-bounded training shards in GLOBAL doc order (the output side
    * of a corpus build: webdataset/arrow shard writers want "shard k
    * holds docs [i..j], ~B bytes"). t06 packs WITHIN a partition key;
    * this needs a global running sum, and a bare `ORDER BY` window is
    * a single-partition bottleneck at 100 TB — so it runs as the
    * canonical TWO-PASS DISTRIBUTED PREFIX SUM: range-partition by
    * doc_id, pass 1 collects ≤P per-partition totals (scalars to the
    * driver, never rows), pass 2 adds each partition's broadcast
    * prefix offset to its local running sum. Shard id = the doc's
    * global START offset over the budget, so a shard never exceeds
    * budget + one doc — exactly the greedy layout the sequential
    * writer produces, computed with P-way parallelism.
    */
  def t24ShardPack(s: SparkSession, dir: String, budgetChars: Long = 100000L,
                   parts: Int = 16): DataFrame = {
    // PERSIST before pass 1: both passes consume the SAME physical
    // partitioning. RangePartitioner samples with a seed derived from
    // the RDD id, so two separate executions of this frame can draw
    // different range boundaries — a doc near a boundary would then
    // take pass-1's offset from partition p but compute pass-2's local
    // running sum in partition p±1, shifting every downstream shard_id
    // by a whole partition total (a flaky, rerun-dependent wrongness).
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
      .repartitionByRange(parts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: P scalar totals (range partitions are ascending in pid)
    val totals = d.groupBy("pid").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = {           // pid -> sum of all EARLIER partitions
      var acc = 0L
      totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    }
    // pass 2's offset lookup is a BROADCAST JOIN on pid, not a folded
    // when() chain: at 100 TB the range partitioner emits thousands of
    // partitions and an O(P)-deep conditional would blow codegen (or
    // fall back to interpreted eval); the (pid, offset) table is P rows
    // — broadcast it and let the hash probe stay O(1) per row
    import s.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("pid", "p_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.join(offDf, "pid")
      .withColumn("cum", sum("n_chars").over(w) + col("p_off"))
      .withColumn("shard_id",
        floor((col("cum") - col("n_chars")) / budgetChars).cast("long"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("shard_chars"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard_id")
  }

  /** C16: deterministic stratified (re)sampling — downsample the
    * dominant language, keep more of the rare ones (the corpus
    * rebalancing step of a training-data build). The keep decision is
    * a content-hash bucket compare (md5 first hex digit), NOT an RNG:
    * stable under reshuffles/re-runs/engine changes — which is exactly
    * why it is oracle-checkable cross-engine where rand()-based
    * sampling never is. Rates: en 8/16, everything else 2/16.
    */
  def t07StratifiedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
      .where((col("lang") === "en" && col("bucket") < "8") ||
        (col("lang") =!= "en" && col("bucket") < "2"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** C49 `t23_reservoir_sample`: fixed-size uniform sample PER GROUP —
    * "give me exactly k docs per language" (eval-set carving, per-domain
    * inspection pulls). Classic reservoir sampling is sequential; the
    * distributed re-expression is hash-rank top-k: rank = md5(doc_id)
    * is uniform and independent of the data, so the k smallest ranks
    * per group ARE a uniform k-sample — and the selection is
    * DETERMINISTIC (reproducible across runs, retries, and engines —
    * what data lineage needs, and what `TABLESAMPLE`/rand() cannot
    * give). Executes on the bounded-heap TopKPerGroup operator: one
    * linear shuffle of (group, rank) rows, heaps of size k per group,
    * never a per-group sort. The same rank column makes the sample
    * STABLE under corpus growth: a doc stays sampled until k better
    * ranks arrive, so incremental re-runs churn minimally.
    */
  def t23ReservoirSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val ranked = docs(s, dir).select(col("lang"), col("doc_id"),
      md5(col("doc_id").cast("string").cast("binary")).as("rk"))
    graft.plans.TopK.perGroup(ranked, Seq("lang"), Seq(("rk", true)), k)
      .select(col("lang"), col("doc_id"))
      .orderBy("lang", "doc_id")
  }

  /** C17: top document-frequency n-grams per language — the
    * boilerplate/vocabulary probe a dedup pass runs first (d04's df
    * cap wants exactly this distribution). Dogfoods the custom
    * TopKPerGroup physical operator (plans/TopKPerGroup.scala): counts
    * shuffle once on (lang, ngram), then bounded heaps take the top k
    * per language — no full per-group sort.
    */
  def t08TopNgrams(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val counts = tokenized(s, dir)
      .select(col("lang"), explode(wordTrigrams(col("toks"))).as("ngram"))
      .groupBy("lang", "ngram").agg(count(lit(1)).as("df"))
    graft.plans.TopK.perGroup(counts, Seq("lang"), Seq(("df", false), ("ngram", true)), k)
      .orderBy(col("lang"), col("df").desc, col("ngram"))
  }

  /** C19 t09: benchmark decontamination — find training docs whose
    * n-gram overlap with an eval set exceeds a threshold (the
    * train/test contamination check every corpus build runs before
    * training). Candidate generation is the shared-shingle equi-join
    * (eval side is tiny — every 50th doc stands in for the benchmark
    * set — so the join is ~|corpus postings| × eval df); the overlap
    * count per (eval, train) pair comes from the same groupBy shape as
    * d04. At 100 TB the eval side stays small by definition, so this
    * is a bloom/broadcast-friendly probe of the corpus, never a
    * corpus×corpus join.
    */
  def t09Decontaminate(s: SparkSession, dir: String, minShared: Int = 5): DataFrame = {
    // r12: the eval side (a benchmark set) BROADCASTS — the corpus-side
    // postings are never shuffled on h (the r11 SHUFFLE_HASH exchanged
    // both sides); the only corpus-scale shuffle left is the
    // (eval, train) pair aggregation, which is bounded by eval-side df.
    // r13: the broadcast is SIZE-GUARDED (guide §3.1) — the fixture's
    // eval side is doc_id % 50, a fixed 2% of ALL postings, so an
    // unconditional hint grows linearly with the corpus and would blow
    // the broadcast limit where the old SHUFFLE_HASH scaled. The eval
    // postings are persisted and counted (they feed the join anyway);
    // over budget the join falls back to the r11 shuffle shape.
    // Shingle hashes come from the one-pass trigram_hash_set kernel
    // (same distinct-shingle count, no string concat; each side's
    // filter pushes below its own explode).
    import graft.functions.functions.trigram_hash_set
    val all = tokenized(s, dir)
      .select(col("doc_id"), explode(trigram_hash_set(col("toks"))).as("h"))
    val evalSide = all.where(col("doc_id") % 50 === 0).toDF("eval_id", "h")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val trainSide = all.where(col("doc_id") % 50 =!= 0).toDF("train_id", "h")
    // ~48 B per broadcast HashedRelation row (two longs + framing/index)
    val evalFits = evalSide.count() * 48L <= broadcastMaxBytes(s)
    val joined =
      if (evalFits) trainSide.join(broadcast(evalSide), Seq("h"))
      else trainSide.hint("SHUFFLE_HASH").join(evalSide, Seq("h"))
    joined
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
      .orderBy("eval_id", "train_id")
  }

  /** C31 `t13_decontaminate_embedding`: SEMANTIC decontamination — the
    * embedding twin of t09's shingle overlap. Paraphrased benchmark
    * leakage shares no n-grams, so modern pipelines also screen train
    * candidates by eval-set cosine similarity. Shape mirrors t09: the
    * eval side is small BY DEFINITION, so it broadcasts across one
    * corpus scan (codegen cosine, no corpus shuffle; the per-eval
    * aggregate is bounded by eval size). At 100 TB the corpus side
    * plugs into the ANN index instead of a full scan (s02/s06 probe
    * with the eval set as queries) — this operator is the exact
    * threshold form the oracle can check.
    */
  def t13DecontaminateEmbedding(s: SparkSession, dir: String,
                                threshold: Double = 0.4): DataFrame = {
    import graft.functions.functions.cosine_sim
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val evalSide = e.where(col("vec_id") < 20).toDF("eval_id", "eval_vec")
    val corpus = e.where(col("vec_id") >= 20)
    corpus.crossJoin(broadcast(evalSide))
      .withColumn("cos", cosine_sim(col("embedding"), col("eval_vec")))
      // threshold on a ROUNDED value, mirrored in the oracle: the two
      // engines' cosine folds can differ in the last ulp, and a pair
      // landing exactly on the threshold would flip n_contaminated
      // across engines — rounding first makes the boundary engine-stable
      .where(round(col("cos"), 6) >= threshold)
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_contaminated"),
        max(round(col("cos"), 4)).as("max_cos"))
      .orderBy("eval_id")
  }

  /** C20 t10: PII scrubbing — regex redaction of emails and phone
    * numbers (pure codegen'd string expressions, scan-speed at 100 TB).
    * The corpus has no real PII, so each doc gets a synthetic
    * contact line appended first (non-vacuous: every doc must have
    * exactly one email + one phone redacted); output counts and the
    * scrubbed-text fingerprint so the oracle verifies the actual
    * replacement, not just the counts.
    */
  def t10PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z0-9.]+"
    val phoneRe = "\\+1-555-[0-9]{4}"
    docs(s, dir)
      .withColumn("dirty",
        concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .select(col("doc_id"),
        size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("dirty"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  private val boiler = Seq.fill(8)("click here to subscribe").mkString(" ")

  /** C24 t11: repetition scoring — the Gopher-family quality rule
    * (repeated n-gram fraction flags boilerplate/spam). rep_ratio =
    * 1 − distinct/total trigram slots, a pure column expression at scan
    * speed. The synthetic corpus is vocabulary-uniform (measured max
    * baseline ratio 0.071), so every 5th doc gets a repeated phrase
    * appended — threshold 0.15 cleanly separates (flagged docs land
    * ≥ ~0.25) and the flag column is non-vacuous in both directions.
    */
  def t11Repetition(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("t2",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))
      .withColumn("toks", tokens(col("t2")))
      .withColumn("n_tri", greatest(size(col("toks")) - 2, lit(0)).cast("long"))
      // distinct-trigram COUNT only — the one-pass hash kernel gives the
      // same count (64-bit collision odds) without building the strings
      .withColumn("n_distinct",
        size(graft.functions.functions.trigram_hash_set(col("toks"))).cast("long"))
      .withColumn("rep_ratio",
        when(col("n_tri") > 0,
          round(lit(1.0) - col("n_distinct") / col("n_tri"), 6)).otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_tri"), col("n_distinct"), col("rep_ratio"),
        (col("rep_ratio") > 0.15).cast("long").as("flag_repetitive"))
      .orderBy("doc_id")

  /** C27 t12: language-model quality scoring — the CCNet-style LM
    * filter (score each document by its average token log-probability;
    * out-of-domain/garbage text scores low). The "model" is a unigram
    * count table over the corpus — at 100 TB a materialized table
    * maintained like any aggregate — and scoring is one equi-join of
    * exploded tokens against it plus a per-doc average: linear shuffle
    * on the token, no driver-side state. ln() on identical rational
    * doubles agrees across engines to the last ulp; the 6-decimal
    * round absorbs summation order.
    */
  def t12LmScore(s: SparkSession, dir: String): DataFrame = {
    // persisted: the token explode feeds BOTH the unigram table and
    // the scoring join — unpersisted, the corpus scan + split + explode
    // kernel runs twice per execution (the t20 rule)
    val toks = tokenized(s, dir).select(col("doc_id"), explode(col("toks")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("total"))
    toks.join(counts, "w")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c") / col("total"))), 6).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** C33 t14: URL/domain filtering — the Common-Crawl-style source
    * screen every web-scale corpus runs first (parse each doc's URL,
    * extract the registrable domain, drop blocklisted sources). Each
    * doc gets a deterministic URL (domain drawn from a closed form of
    * doc_id), the domain is recovered by ACTUALLY parsing the URL
    * (regexp_extract — a parse bug flips the domain and the hash), and
    * the screen is a broadcast left join against a blocklist TABLE —
    * the 100-TB shape (the list is dims-sized; the corpus scan never
    * shuffles; at larger list sizes the same join bloom-prunes like
    * d06). Flags, not drops, so the oracle checks both directions.
    */
  def t14UrlFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val domains = Seq("alpha.example.com", "beta.example.org", "spamfarm.biz",
      "gamma.example.net", "delta.example.com", "adtracker.click",
      "epsilon.example.io", "zeta.example.edu")
    val blocklist = Seq("spamfarm.biz", "adtracker.click").toDF("bad")
    docs(s, dir)
      .select(col("doc_id"),
        concat(lit("https://"),
          element_at(array(domains.map(lit): _*), (col("doc_id") % 8).cast("int") + 1),
          lit("/doc/"), col("doc_id")).as("url"))
      .withColumn("domain", regexp_extract(col("url"), "https?://([a-z0-9.-]+)/", 1))
      .join(broadcast(blocklist), col("domain") === col("bad"), "left")
      .select(col("doc_id"), col("domain"),
        when(col("bad").isNotNull, 1L).otherwise(0L).as("blocked"))
      .orderBy("doc_id")
  }

  /** C36 t16: PARAGRAPH-level dedup scoring — the Dolma/CCNet rule
    * that precedes document-level dedup in production pipelines:
    * boilerplate (cookie banners, footers, nav chrome) repeats as
    * paragraphs ACROSS documents whose full texts are unique, so docs
    * are scored by their fraction of corpus-duplicated paragraphs.
    * Scale shape: explode paragraphs → ONE linear shuffle on the
    * paragraph (count distinct docs per para) → join back; no
    * pairwise anything. The synthetic corpus has unique texts and no
    * separators, so two boilerplate paragraphs are injected at
    * different cadences (every 4th and 6th doc) — the dup fraction
    * then has a closed form DuckDB recomputes, and the flag flips in
    * both directions.
    */
  def t16ParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val sep = "#P#"
    val b1 = "subscribe to our newsletter for updates"
    val b2 = "all rights reserved contact support for help"
    val paras = docs(s, dir)
      .withColumn("ptext", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(sep + b1)).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(sep + b2)).otherwise(lit(""))))
      .select(col("doc_id"), explode(split(col("ptext"), sep)).as("para"))
    val byPara = paras.groupBy("para")
      .agg(countDistinct("doc_id").as("ndocs"))
    paras.join(byPara, "para")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_paras"), col("n_dup"),
        round(col("n_dup") / col("n_paras"), 6).as("dup_frac"),
        (col("n_dup") > 0).cast("long").as("flag_boilerplate"))
      .orderBy("doc_id")
  }

  /** C37 t17: BM25 ranked retrieval over the corpus — the lexical
    * scorer behind search-based decontamination and retrieval-augmented
    * data curation (Robertson/Spärck Jones BM25, with Lucene's
    * non-negative idf ln(1+(N−df+0.5)/(df+0.5)); public formulas).
    * Scale shape: the query's terms are filtered INSIDE the explode
    * (predicate on the generator output, before any shuffle), so the
    * only shuffled rows are (doc, query-term) pairs — O(matching
    * postings), never O(corpus tokens); the per-term document
    * frequencies are a ≤|Q|-row aggregate broadcast back, and the
    * corpus scalars (N, avgdl) ride a 1-row broadcast cross join.
    * On 100 TB this is the standard two-aggregate BM25 job; nothing
    * is quadratic and the corpus is read once.
    */
  def t17Bm25(s: SparkSession, dir: String): DataFrame = {
    val query = Seq("spark", "merge", "vector")
    val (k1, b) = (1.2, 0.75)
    val toks = docs(s, dir)
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val scalars = toks.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(query: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct("doc_id").as("dfr"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(scalars))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("dfr") + 0.5) / (col("dfr") + 0.5)))
      .withColumn("part",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("part"), 6).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
  }

  /** C39 t18: DOMAIN-MIX rebalancing — the mixture step every corpus
    * build runs after filtering (Pile/Dolma-style "mixture weights"):
    * sources contribute wildly unequal token mass, and training wants a
    * TARGET share per source, enforced by deterministic downsampling.
    * Here the target is the canonical "balance the domains" config —
    * an equal token share per source of a half-corpus budget, with the
    * per-source keep-RATE derived from corpus statistics (not a fixed
    * per-class literal like t07): rate_s = min(1, target/src_tokens),
    * applied as a pure-arithmetic Knuth-multiplicative hash bucket on
    * doc_id (cross-engine exact — no engine hash function involved).
    * Scale shape: one token-count pass, a source-sized aggregate
    * broadcast back, one filtered pass — the corpus never shuffles.
    */
  def t18DomainMix(s: SparkSession, dir: String): DataFrame = {
    val tk = docs(s, dir).select(col("doc_id"), col("source"),
      size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= ""))
        .cast("long").as("tk"))
    val bySrc = tk.groupBy("source").agg(sum("tk").as("src_tokens"))
    val tot = bySrc.agg(sum("src_tokens").as("total_tokens"),
      count(lit(1)).as("n_src"))
    val plan = bySrc.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        floor(floor(col("total_tokens") * 0.5) / col("n_src")).cast("long"))
      .withColumn("thr",
        floor(least(lit(1.0), col("target_tokens").cast("double") / col("src_tokens")) * 4096)
          .cast("long"))
    val kept = tk.join(broadcast(plan.select("source", "thr")), "source")
      .where(pmod(col("doc_id") * lit(2654435761L), lit(4096L)) < col("thr"))
    kept.groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum("tk").as("kept_tokens"))
      .join(plan.select("source", "src_tokens", "target_tokens"), "source")
      .select(col("source"), col("src_tokens"), col("target_tokens"),
        col("kept_docs"), col("kept_tokens"),
        round(col("kept_tokens").cast("double") / col("target_tokens"), 4).as("fill_ratio"))
      .orderBy("source")
  }

  /** C41 t19: EXACT-SUBSTRING dedup — the "dedupe repeated spans, not
    * just whole documents" pass (the public ExactSubstr idea from Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", re-expressed scalably: fixed 60-char windows at stride 30
    * stand in for the suffix-array match set, so any repeated span
    * ≥ 2·stride chars is guaranteed to share a full window). Each doc
    * emits O(len/stride) window hashes; ownership of a shared window
    * goes to the smallest doc_id, and every other doc counts it as a
    * duplicated span. Scale shape: one explode (linear in corpus
    * chars), one groupBy on the window hash, one equi-join back on the
    * hash — never all-pairs, never a suffix array in memory; the
    * window text itself is dropped at the hash so the shuffle carries
    * 32-byte keys, not corpus text.
    */
  def t19SubstringDedup(s: SparkSession, dir: String): DataFrame = {
    val W = 60
    val S = 30
    val wins = docs(s, dir)
      .where(length(col("text")) >= W)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - lit(W - 1), lit(S))).as("pos"),
        col("text"))
      .select(col("doc_id"), md5(col("text").substr(col("pos"), lit(W))).as("h"))
      .distinct()
    val own = wins.groupBy("h")
      .agg(min("doc_id").as("owner"), count(lit(1)).as("nd"))
    wins.join(own, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("nd") > 1 && col("doc_id") > col("owner"), 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        round(col("n_dup") / col("n_windows"), 6).as("dup_frac"),
        (col("n_dup") > 0).cast("long").as("flag_dup"))
      .orderBy("doc_id")
  }

  /** C42 t20: DSIR importance weighting — data selection via hashed
    * n-gram importance resampling (the public method of Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): unigram features hash into 256 buckets, a TARGET
    * domain (here lang='en' as the in-domain proxy) and the RAW corpus
    * each induce a smoothed bucket distribution, and every doc scores
    * the log importance ratio Σ c_b·(ln p̂_target(b) − ln p̂_raw(b)).
    * The bucket key is the first two hex chars of md5(term) — a pure
    * string both engines compute identically, no engine-native hash.
    * Scale shape: one tokenize+explode pass into per-(doc,bucket)
    * counts (the only corpus-sized shuffle), the 256-row bucket table
    * and 1-row totals broadcast back, one final groupBy(doc). The
    * corpus is read once; nothing driver-side. TextSpec additionally
    * checks the discrimination property (target-domain docs score
    * highest per token).
    */
  def t20Dsir(s: SparkSession, dir: String): DataFrame = {
    // feats feeds the bucket table AND the final per-doc fold — persist
    // the (doc, bucket)-sized counts so the corpus tokenize pass runs
    // ONCE, not once per consumer (the Dedup/Ann rule: materialize the
    // small multi-consumer intermediate, never rescan the corpus)
    val feats = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")).as("term"))
      .withColumn("b", substring(md5(col("term")), 1, 2))
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // BOTH distributions from one pass over feats: raw = every doc,
    // target = the in-domain slice, as a conditional sum
    val buckets = feats.groupBy("b").agg(sum("c").as("r"),
      sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("tt"))
    val tot = buckets.agg(sum("r").as("rtot"), sum("tt").as("ttot"))
    feats.join(broadcast(buckets), "b").crossJoin(broadcast(tot))
      .withColumn("contrib",
        col("c") * (log((col("tt") + 0.5) / (col("ttot") + 128.0)) -
          log((col("r") + 0.5) / (col("rtot") + 128.0))))
      .groupBy("doc_id")
      .agg(sum("c").as("n_toks"), round(sum("contrib"), 4).as("logratio"))
      .orderBy("doc_id")
  }

  /** C46 t21: EXACT-SUBSTRING SCRUB — t19's detection taken to the
    * operation Lee et al. 2022 actually run: CUT the duplicated spans
    * from non-owner docs (whole-doc dropping throws away the unique
    * remainder; span surgery keeps it). Duplicated window positions
    * merge into contiguous islands (stride-30 windows overlap or touch
    * when gaps ≤ window length — classic gaps-and-islands over the
    * position stream, one per-doc window sort) and each island cuts
    * `last − first + W` chars. Scale shape: t19's linear window/hash
    * passes plus ONE window function partitioned by doc — never a
    * per-doc collect, never all-pairs; output is the scrub ledger
    * (chars removed/kept per doc), which at 100 TB is what the
    * downstream tokenizer budget actually consumes.
    */
  def t21SubstringScrub(s: SparkSession, dir: String): DataFrame = {
    val W = 60
    val S = 30
    val wins = docs(s, dir)
      .where(length(col("text")) >= W)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - lit(W - 1), lit(S))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("text").substr(col("pos"), lit(W))).as("h"))
    val own = wins.groupBy("h")
      .agg(min("doc_id").as("owner"), countDistinct("doc_id").as("nd"))
    val dup = wins.join(own, "h")
      .where(col("nd") > 1 && col("doc_id") > col("owner"))
      .select(col("doc_id"), col("pos"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val run = byDoc.rowsBetween(Long.MinValue, 0)
    val per = dup
      .withColumn("newisl",
        when(col("pos") - lag("pos", 1).over(byDoc) <= W, 0L).otherwise(1L))
      .withColumn("isl", sum("newisl").over(run))
      .groupBy("doc_id", "isl")
      .agg((max("pos") - min("pos") + W).as("cut"))
      .groupBy("doc_id")
      .agg(sum("cut").as("removed"), count(lit(1)).as("n_islands"))
    docs(s, dir)
      .where(length(col("text")) >= W)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("removed"), lit(0L)).cast("long").as("removed_chars"),
        (col("n_chars") - coalesce(col("removed"), lit(0L))).cast("long").as("kept_chars"),
        coalesce(col("n_islands"), lit(0L)).cast("long").as("n_islands"))
      .orderBy("doc_id")
  }

  /** C53 `t25_tfidf_keywords`: per-document keyword extraction by
    * TF-IDF — the standard topical-labeling pass a curation pipeline
    * runs for mixture analysis and topic-balanced sampling (classic
    * tf·ln(N/df) weighting; public formula). Scale shape: one token
    * explode → (doc,term) counts (linear shuffle), a vocab-sized df
    * aggregate joined back BROADCAST (document frequency tables are
    * ~10⁷ rows at web scale — broadcastable; beyond that the join
    * degrades gracefully to a shuffle on term), and the per-doc top-k
    * through the bounded-heap [[graft.plans.TopKPerGroup]] operator —
    * no corpus-wide sort, no window. Cross-engine audit on this
    * corpus: min adjacent tfidf gap at any rank boundary 7.0e-4, all
    * exact ties share identical (tf, df) (bit-equal doubles → the term
    * tie-break fires identically), round-6 boundary distance ≥0.01 —
    * ln() ulp drift between engines cannot reorder or reround.
    */
  def t25TfidfKeywords(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val tf = tokenized(s, dir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n_docs") * lit(1.0) / col("df")))
    graft.plans.TopK.perGroup(scored, Seq("doc_id"),
        Seq(("tfidf", false), ("term", true)), k, rankCol = Some("rank"))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** C57 `t26_zipf_fit`: per-source Zipf diagnostics — the corpus
    * health check (natural text follows freq ∝ rank^-s; machine-
    * generated/templated text departs, so the fitted slope and R² per
    * SOURCE flag synthetic or boilerplate-heavy feeds before they
    * reach training). Scale shape: one token explode → (source, term)
    * counts (linear shuffle); ranking and the least-squares fit run on
    * the AGGREGATED vocab table — vocab-sized per source, orders of
    * magnitude below the corpus — with the rank window PARTITIONED by
    * source (never a global sort). The fit is regr_slope/regr_r2 over
    * (ln rank, ln freq), both ANSI aggregates computed from identical
    * doubles in both engines (q43's precedent); rank ties pinned by
    * (freq desc, term) so both engines rank identically.
    */
  def t26ZipfFit(s: SparkSession, dir: String): DataFrame = {
    val counts = tokenized(s, dir)
      .select(col("source"), explode(col("toks")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("f"))
    val ranked = counts.withColumn("rk",
      row_number().over(Window.partitionBy("source")
        .orderBy(col("f").desc, col("term"))))
    ranked.groupBy("source")
      .agg(round(expr("regr_slope(ln(f), ln(rk))"), 4).as("zipf_slope"),
        round(expr("regr_r2(ln(f), ln(rk))"), 4).as("fit_r2"),
        count(lit(1)).as("vocab"),
        sum("f").as("total_tokens"))
      .orderBy("source")
  }

  /** C60 `t27_chunk_overlap`: overlapping-window document chunking —
    * the context-window splitter every pretraining/RAG pipeline runs on
    * long documents (fixed window W, stride S < W so consecutive chunks
    * overlap by W−S tokens and no boundary context is lost). Chunk
    * starts are PURE ARITHMETIC on the token array (sequence + filter —
    * no explode-then-window, no per-doc state): a start survives iff it
    * is the first OR the previous chunk did not already reach the end
    * of the doc (the standard "last chunk ends at n" rule, fully
    * deterministic and identically expressed in both engines). One
    * row per chunk with its id, span, size, first token and an md5
    * over the joined chunk text — a boundary off-by-one anywhere
    * flips the hash. Scale: map-only (the only shuffle is the
    * presentation sort); output is O(corpus tokens / S).
    */
  def t27ChunkOverlap(s: SparkSession, dir: String,
                      window: Int = 16, stride: Int = 12): DataFrame = {
    val (w, st) = (window, stride)
    tokenized(s, dir)
      .withColumn("n", size(col("toks")))
      .withColumn("starts",
        filter(sequence(lit(1), col("n"), lit(st)),
          x => x === 1 || x - st + (w - 1) < col("n")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(col("starts")).as("start"))
      .withColumn("end_tok", least(col("start") + (w - 1), col("n")))
      .select(col("doc_id"),
        (((col("start") - 1) / st) + 1).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        col("end_tok").cast("long").as("end_tok"),
        (col("end_tok") - col("start") + 1).cast("long").as("n_chunk_toks"),
        element_at(col("toks"), col("start")).as("first_tok"),
        md5(array_join(
          slice(col("toks"), col("start"), col("end_tok") - col("start") + 1),
          " ").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** C64 `t28_quality_gate`: corpus-RELATIVE quality filtering — keep
    * the documents above the corpus median quality. Production filters
    * gate on corpus-relative quantiles, not fixed constants (mixture
    * drift moves any absolute threshold); this is the data-driven
    * form of t02's scores. One quality pass → a 1-row quantile
    * aggregate broadcast back → one filtered pass; the corpus never
    * shuffles. The exact percentile is the oracle's requirement —
    * q28's sketch is the documented 100-TB quantile path, and the
    * gate semantics are identical under either. A doc exactly AT the
    * median is excluded in both engines (strict >, and the
    * interpolated median is bit-equal from identical rounded inputs —
    * the q23 crossing precedent).
    */
  def t28QualityGate(s: SparkSession, dir: String): DataFrame = {
    // r12: quality computed ONCE and persisted — the r11 form derived it
    // through t02's full projection (with its presentation sort in the
    // cached lineage) separately for the median aggregate and the final
    // filtered pass, tokenizing the corpus twice. qualityScoreCol is
    // bit-identical to t02's `quality` (same blend, same round).
    val q = docs(s, dir)
      .select(col("doc_id"), qualityScoreCol(col("text")).as("quality"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val med = q.agg(expr("percentile(quality, 0.5)").as("med"))
    q.crossJoin(broadcast(med))
      .where(col("quality") > col("med"))
      .select(col("doc_id"), col("quality"),
        round(col("med"), 6).as("corpus_median"))
      .orderBy("doc_id")
  }

  /** Misra-Gries summary update/merge — the classic BOUNDED-MEMORY
    * heavy-hitters sketch (public algorithm): capacity `m` counters;
    * a full summary decrements ALL counters instead of inserting
    * (amortized O(1): each decrement round discharges m insertions);
    * merge = sum counters, then subtract the (m+1)-th largest count
    * and drop non-positives. Invariant after any update/merge
    * sequence: every item with true frequency > N/m survives with a
    * counter underestimating by at most N/m.
    */
  private def mgUpdate(mg: java.util.HashMap[String, Long], m: Int, tok: String): Unit = {
    val cur = mg.get(tok)
    if (cur != 0L || mg.containsKey(tok)) { mg.put(tok, cur + 1L); () }
    else if (mg.size < m) { mg.put(tok, 1L); () }
    else {
      val it = mg.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }
  private def mgMerge(m: Int)(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (sum.size <= m) sum
    else {
      val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(m)
      sum.iterator.map { case (k, v) => k -> (v - cut) }.filter(_._2 > 0L).toMap
    }
  }

  /** C65 `t29_heavy_hitters`: EXACT corpus-wide top-k tokens via the
    * TWO-PASS heavy-hitters shape — pass 1 builds per-partition
    * Misra-Gries summaries (capacity m, bounded memory REGARDLESS of
    * vocabulary size) and tree-merges them into a candidate set that
    * provably contains every token with frequency > N/m; pass 2
    * re-scans and EXACTLY counts candidates only, so the shuffle
    * carries O(m) keys instead of the whole vocabulary. With k ≪ m and
    * a Zipfian corpus the result IS the true top-k (any true top-k
    * token's frequency dwarfs N/m), which is what makes the key
    * oracle-able: DuckDB recomputes the top-k from full exact counts.
    * The 100-TB contrast: a plain groupBy-count top-k shuffles the
    * VOCABULARY (billions of keys for web text); this shuffles 2048.
    */
  def t29HeavyHitters(s: SparkSession, dir: String, m: Int = 2048, k: Int = 20): DataFrame = {
    val toks = docs(s, dir)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
    val candidates: Array[String] = toks.select("tok").rdd.map(_.getString(0))
      .mapPartitions { it =>
        val mg = new java.util.HashMap[String, Long](m * 2)
        it.foreach(mgUpdate(mg, m, _))
        Iterator.single(scala.jdk.CollectionConverters.MapHasAsScala(mg).asScala.toMap)
      }
      .treeReduce(mgMerge(m)(_, _))
      .keysIterator.toArray
    toks.where(col("tok").isInCollection(candidates)) // InSet: one codegen'd probe
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tok"))
      .limit(k)
  }

  /** C67 `p01_pipeline_e2e`: the CURATION PIPELINE COMPOSED — exact
    * dedup → language ID → quality gate → deterministic split → token
    * fold, the canonical pre-training data path run as ONE dataframe
    * chain (each stage is a verified operator: t04's fingerprint, d01's
    * keep-min-owner dedup, t01's stopword lang-ID, t02's quality blend,
    * t05's content-hash split). The point of the key is COMPOSITION:
    * stage outputs feed stage inputs with no materialization between,
    * Catalyst fuses the per-row stages into one scan pass, and the only
    * shuffles are the dedup groupBy, its owner join-back, and the final
    * (lang, split)-sized fold. One DuckDB CTE chain recomputes the
    * whole pipeline — a drift in ANY stage (or in how they compose)
    * breaks the hash.
    */
  def p01PipelineE2e(s: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    // one scan pass: fingerprint + every per-row feature
    val enriched = docs(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        fingerprintCol(col("text")).as("fingerprint"), // t04's kernel form
        stopCount(toks, enStops).as("en_n"), stopCount(toks, deStops).as("de_n"),
        stopCount(toks, frStops).as("fr_n"), stopCount(toks, esStops).as("es_n"),
        size(toks).cast("long").as("n_words"),
        graft.functions.functions.distinct_tokens(toks).cast("long").as("n_distinct"),
        substring(md5(col("text").cast("binary")), 1, 1).as("bucket"))
    // exact dedup: the smallest doc_id owns each fingerprint class.
    // r12: one window-min over the fingerprint partition instead of
    // groupBy-owners + join-back — the r11 join consumed `enriched`
    // TWICE, recomputing every per-row feature (stopcounts, two md5s,
    // the normalization regex) for both sides; the window shuffles the
    // narrow feature rows once and keeps each class's min inline.
    val kept = enriched
      .withColumn("own",
        min("doc_id").over(Window.partitionBy("fingerprint")))
      .where(col("own") === col("doc_id"))
      .drop("own")
    kept
      .withColumn("pred_lang",
        when(col("en_n") >= col("de_n") && col("en_n") >= col("fr_n") &&
          col("en_n") >= col("es_n") && col("en_n") > 0, "en")
          .when(col("de_n") >= col("fr_n") && col("de_n") >= col("es_n") &&
            col("de_n") > 0, "de")
          .when(col("fr_n") >= col("es_n") && col("fr_n") > 0, "fr")
          .when(col("es_n") > 0, "es")
          .otherwise("und"))
      .withColumn("quality", // t02's blend; en_n IS its n_stop term
        round(lit(0.4) * (col("n_distinct") * lit(1.0) / col("n_words")) +
          lit(0.4) * (lit(1.0) - col("en_n") * lit(1.0) / col("n_words")) +
          lit(0.2) * least(col("n_words") * lit(1.0) / 100.0, lit(1.0)), 4))
      .withColumn("split",
        when(col("bucket") < "c", "train")
          .when(col("bucket").isin("c", "d"), "val")
          .otherwise("test"))
      .where(col("quality") > 0.5)
      .groupBy("pred_lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").cast("long").as("tokens_total"))
      .orderBy("pred_lang", "split")
  }

  /** C72 `t30_sql_text_funcs`: the text-pipeline heuristics as SQL
    * FUNCTIONS — lang_id / quality_score / token_count /
    * doc_fingerprint registered by GraftExtensions, so the curation
    * filters every t01-t04 consumer writes in Scala are one SELECT of
    * text. Each function IS the operator's Column expression (no
    * parallel derivation); the oracle folds the four proven t01-t04
    * closed forms into one DuckDB statement.
    */
  def t30SqlTextFuncs(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Catalog.register(s, dir)
    s.sql("""SELECT doc_id, lang_id(text) AS pred_lang,
            |       quality_score(text) AS quality,
            |       token_count(text) AS ws_tokens,
            |       doc_fingerprint(text) AS fingerprint
            |FROM documents ORDER BY doc_id""".stripMargin)
  }

  /** C77 `t31_classifier_score`: QUALITY-CLASSIFIER INFERENCE — the
    * fastText/CCNet-style learned filter production curation stacks
    * run after the heuristic screens (t02): a linear model over HASHED
    * token features, z = b0 + mean(w[h(tok)]), keep when z > 0. The
    * engine's job is the INFERENCE PLAN, not training (no model
    * artifact ships, so the 256-bucket weight table is built from a
    * fixed closed form — the structure is exactly what a trained
    * artifact would load into): tokens explode scan-side, the feature
    * hash is md5-prefix bucketing (portable: Spark md5 == DuckDB md5),
    * weights arrive by BROADCAST join (a model is dims-sized at any
    * corpus scale — 2^18 buckets is still KBs), and the per-doc mean
    * is ONE partial-agg shuffle hashed on doc_id. Nothing else moves:
    * at 100 TB this is a linear scan + the same doc_id exchange every
    * per-doc aggregate pays.
    *
    * NUMERIC CONTRACT: weights are INTEGER milli-units and the
    * aggregate is their exact BIGINT sum — order-independent, so both
    * engines derive the logit from IDENTICAL integers (a float mean
    * is association-sensitive, and z = S/(2^a 5^b n) is a terminating
    * decimal that can land exactly on a rounding tie, where Spark's
    * HALF_UP and DuckDB's binary rounding disagree — observed at
    * sf0.01). The logit therefore ships as its exact integer
    * numerator (50·n + S, in milli-units·n) and keep tests its sign;
    * only the sigmoid — transcendental, never an exact decimal tie —
    * is rounded.
    */
  def t31ClassifierScore(s: SparkSession, dir: String): DataFrame = {
    // the "model": 256 hash buckets keyed by the first md5 hex pair,
    // integer milli-weights in [-498, 498] (Weyl-style closed form —
    // deterministic in both engines, exact in the table and the sum)
    val weights = s.range(256).select(
      lpad(lower(hex(col("id"))), 2, "0").as("bucket"),
      (((col("id") + 1) * lit(2654435761L)) % 997 - 498).as("w_milli"))
    val zNum = lit(50L) * col("n_tokens") + col("w_sum_milli") // b0=0.05 in milli·n
    tokenized(s, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("bucket", substring(md5(col("tok").cast("binary")), 1, 2))
      .join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_milli")).as("w_sum_milli"))
      .select(col("doc_id"), col("n_tokens"), col("w_sum_milli"),
        zNum.as("logit_milli_n"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(zNum.cast("double") / (col("n_tokens") * lit(1000.0))))), 6).as("score"),
        when(zNum > 0, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t31_classifier_score" -> t31ClassifierScore _,
    "t30_sql_text_funcs" -> t30SqlTextFuncs _,
    "p01_pipeline_e2e" -> p01PipelineE2e _,
    "t29_heavy_hitters" -> ((s, dir) => t29HeavyHitters(s, dir)),
    "t28_quality_gate" -> t28QualityGate _,
    "t27_chunk_overlap" -> ((s, dir) => t27ChunkOverlap(s, dir)),
    "t26_zipf_fit" -> t26ZipfFit _,
    "t25_tfidf_keywords" -> ((s, dir) => t25TfidfKeywords(s, dir)),
    "t21_substring_scrub" -> t21SubstringScrub _,
    "t20_dsir" -> t20Dsir _,
    "t19_substring_dedup" -> t19SubstringDedup _,
    "t18_domain_mix" -> t18DomainMix _,
    "t17_bm25" -> t17Bm25 _,
    "t16_paragraph_dedup" -> t16ParagraphDedup _,
    "t14_url_filter" -> t14UrlFilter _,
    "t09_decontaminate" -> ((s, dir) => t09Decontaminate(s, dir)),
    "t13_decontaminate_embedding" -> ((s, dir) => t13DecontaminateEmbedding(s, dir)),
    "t11_repetition" -> t11Repetition _,
    "t12_lm_score" -> t12LmScore _,
    "t10_pii_scrub" -> t10PiiScrub _,
    "t01_lang_id" -> t01LangId _,
    "t02_quality_score" -> t02QualityScore _,
    "t03_token_count" -> t03TokenCount _,
    "t04_fingerprint" -> t04Fingerprint _,
    "t05_train_split" -> t05TrainSplit _,
    "t06_pack" -> ((s, dir) => t06Pack(s, dir)),
    "t07_stratified_sample" -> t07StratifiedSample _,
    "t08_top_ngrams" -> ((s, dir) => t08TopNgrams(s, dir)),
    "t23_reservoir_sample" -> ((s, dir) => t23ReservoirSample(s, dir)),
    "t24_shard_pack" -> ((s, dir) => t24ShardPack(s, dir)))

  private[pipeline] def listLit(stops: Seq[String]): String =
    stops.map(s => s"'$s'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "t31_classifier_score" ->
      """WITH w AS (
        |  SELECT lpad(lower(to_hex(i)), 2, '0') AS bucket,
        |    CAST(((i + 1) * 2654435761) % 997 - 498 AS BIGINT) AS w_milli
        |  FROM range(256) t(i)
        |), toks AS (
        |  SELECT doc_id, substr(md5(tok), 1, 2) AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(w.w_milli) AS BIGINT) AS w_sum_milli
        |  FROM toks JOIN w USING (bucket)
        |  GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens, w_sum_milli,
        |  50 * n_tokens + w_sum_milli AS logit_milli_n,
        |  round(1.0 / (1.0 + exp(-(CAST(50 * n_tokens + w_sum_milli AS DOUBLE)
        |    / (n_tokens * 1000.0)))), 6) AS score,
        |  CAST(CASE WHEN 50 * n_tokens + w_sum_milli > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    "t30_sql_text_funcs" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(enStops)}, t))) AS en_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(deStops)}, t))) AS de_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(frStops)}, t))) AS fr_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(esStops)}, t))) AS es_n,
         |    len(string_split(text, ' ')) AS n_words,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE WHEN en_n >= de_n AND en_n >= fr_n AND en_n >= es_n AND en_n > 0 THEN 'en'
         |       WHEN de_n >= fr_n AND de_n >= es_n AND de_n > 0 THEN 'de'
         |       WHEN fr_n >= es_n AND fr_n > 0 THEN 'fr'
         |       WHEN es_n > 0 THEN 'es'
         |       ELSE 'und' END AS pred_lang,
         |  round(0.4 * (n_distinct * 1.0 / n_words) +
         |        0.4 * (1.0 - en_n * 1.0 / n_words) +
         |        0.2 * least(n_words * 1.0 / 100.0, 1.0), 4) AS quality,
         |  len(string_split_regex(trim(text), ' +')) AS ws_tokens,
         |  md5(trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint
         |FROM f ORDER BY doc_id""".stripMargin,
    // the WHOLE pipeline recomputed as one CTE chain: any stage drift
    // (or composition drift) breaks the hash
    "p01_pipeline_e2e" ->
      s"""WITH enr AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(enStops)}, t))) AS en_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(deStops)}, t))) AS de_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(frStops)}, t))) AS fr_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(esStops)}, t))) AS es_n,
         |    len(string_split(text, ' ')) AS n_words,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |    substr(md5(text), 1, 1) AS bucket
         |  FROM documents
         |), own AS (
         |  SELECT fingerprint, min(doc_id) AS doc_id FROM enr GROUP BY fingerprint
         |), kept AS (
         |  SELECT e.* FROM enr e JOIN own o
         |  ON e.fingerprint = o.fingerprint AND e.doc_id = o.doc_id
         |), staged AS (
         |  SELECT
         |    CASE WHEN en_n >= de_n AND en_n >= fr_n AND en_n >= es_n AND en_n > 0 THEN 'en'
         |         WHEN de_n >= fr_n AND de_n >= es_n AND de_n > 0 THEN 'de'
         |         WHEN fr_n >= es_n AND fr_n > 0 THEN 'fr'
         |         WHEN es_n > 0 THEN 'es'
         |         ELSE 'und' END AS pred_lang,
         |    round(0.4 * (n_distinct * 1.0 / n_words) +
         |          0.4 * (1.0 - en_n * 1.0 / n_words) +
         |          0.2 * least(n_words * 1.0 / 100.0, 1.0), 4) AS quality,
         |    CASE WHEN bucket < 'c' THEN 'train'
         |         WHEN bucket IN ('c', 'd') THEN 'val'
         |         ELSE 'test' END AS split,
         |    n_words
         |  FROM kept
         |)
         |SELECT pred_lang, split, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS tokens_total
         |FROM staged WHERE quality > 0.5
         |GROUP BY pred_lang, split ORDER BY pred_lang, split""".stripMargin,
    // exact top-k from FULL counts: the sketch+recount pipeline must
    // land on the identical board (candidates provably cover the top)
    "t29_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        |  FROM documents
        |)
        |SELECT tok, count(*) AS cnt FROM toks
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,
    "t28_quality_gate" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_words,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |    len(list_filter(string_split(text, ' '),
         |        t -> list_contains(${listLit(enStops)}, t))) AS n_stop
         |  FROM documents
         |), q AS (
         |  SELECT doc_id,
         |    round(0.4 * (n_distinct * 1.0 / n_words) +
         |          0.4 * (1.0 - n_stop * 1.0 / n_words) +
         |          0.2 * least(n_words * 1.0 / 100.0, 1.0), 4) AS quality
         |  FROM f
         |), m AS (
         |  SELECT quantile_cont(quality, 0.5) AS med FROM q
         |)
         |SELECT doc_id, quality, round(med, 6) AS corpus_median
         |FROM q, m WHERE quality > med ORDER BY doc_id""".stripMargin,
    "t27_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, w, n, s
        |  FROM t, unnest(generate_series(1, n, 12)) AS u(s)
        |  WHERE s = 1 OR s - 12 + 15 < n
        |)
        |SELECT doc_id,
        |  CAST((s - 1) // 12 + 1 AS BIGINT) AS chunk_idx,
        |  CAST(s AS BIGINT) AS start_tok,
        |  CAST(least(s + 15, n) AS BIGINT) AS end_tok,
        |  CAST(least(s + 15, n) - s + 1 AS BIGINT) AS n_chunk_toks,
        |  w[s] AS first_tok,
        |  md5(array_to_string(w[s:least(s + 15, n)], ' ')) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "t26_zipf_fit" ->
      """WITH tf AS (
        |  SELECT source, t AS term, count(*) AS f
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT source, term, f,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY f DESC, term) AS rk
        |  FROM tf
        |)
        |SELECT source,
        |  round(regr_slope(ln(f), ln(rk)), 4) AS zipf_slope,
        |  round(regr_r2(ln(f), ln(rk)), 4) AS fit_r2,
        |  count(*) AS vocab,
        |  CAST(sum(f) AS BIGINT) AS total_tokens
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "t25_tfidf_keywords" ->
      """WITH tf AS (
        |  SELECT doc_id, t AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1, 2
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT doc_id, term, tf, df, tf * ln(n_docs * 1.0 / df) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                              ORDER BY tfidf DESC, term) AS rn
        |  FROM sc
        |)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, tf, df,
        |  round(tfidf, 6) AS tfidf
        |FROM r WHERE rn <= 5 ORDER BY doc_id, rank""".stripMargin,
    "t21_substring_scrub" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, md5(substr(text, CAST(pos AS INTEGER), 60)) AS h
        |  FROM documents, unnest(generate_series(1, len(text) - 59, 30)) AS t(pos)
        |  WHERE len(text) >= 60
        |), own AS (
        |  SELECT h, min(doc_id) AS owner, count(DISTINCT doc_id) AS nd FROM w GROUP BY h
        |), dup AS (
        |  SELECT w.doc_id, w.pos FROM w JOIN own o USING (h)
        |  WHERE o.nd > 1 AND w.doc_id > o.owner
        |), isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 60
        |         THEN 0 ELSE 1 END AS newisl
        |  FROM dup
        |), grp AS (
        |  SELECT doc_id, pos,
        |    sum(newisl) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM isl
        |), cuts AS (
        |  SELECT doc_id, isl, max(pos) - min(pos) + 60 AS cut FROM grp GROUP BY 1, 2
        |), per AS (
        |  SELECT doc_id, CAST(sum(cut) AS BIGINT) AS removed, CAST(count(*) AS BIGINT) AS n_islands
        |  FROM cuts GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars,
        |  coalesce(p.removed, 0) AS removed_chars,
        |  CAST(len(d.text) AS BIGINT) - coalesce(p.removed, 0) AS kept_chars,
        |  coalesce(p.n_islands, 0) AS n_islands
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |WHERE len(d.text) >= 60
        |ORDER BY d.doc_id""".stripMargin,
    "t19_substring_dedup" ->
      """WITH w0 AS (
        |  SELECT doc_id, md5(substr(text, CAST(pos AS INTEGER), 60)) AS h
        |  FROM documents, unnest(generate_series(1, len(text) - 59, 30)) AS t(pos)
        |  WHERE len(text) >= 60
        |), w AS (SELECT DISTINCT doc_id, h FROM w0),
        |own AS (SELECT h, min(doc_id) AS owner, count(*) AS nd FROM w GROUP BY h)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(CASE WHEN o.nd > 1 AND w.doc_id > o.owner THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(sum(CASE WHEN o.nd > 1 AND w.doc_id > o.owner THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac,
        |  CAST(max(CASE WHEN o.nd > 1 AND w.doc_id > o.owner THEN 1 ELSE 0 END) AS BIGINT) AS flag_dup
        |FROM w JOIN own o USING (h)
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,
    "t20_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
        |  FROM documents
        |), feats AS (
        |  SELECT doc_id, lang, substr(md5(term), 1, 2) AS b, count(*) AS c
        |  FROM toks GROUP BY 1, 2, 3
        |), raw AS (
        |  SELECT b, sum(c) AS r FROM feats GROUP BY b
        |), tgt AS (
        |  SELECT b, sum(c) AS tt FROM feats WHERE lang = 'en' GROUP BY b
        |), buckets AS (
        |  SELECT raw.b, raw.r, coalesce(tgt.tt, 0) AS tt FROM raw LEFT JOIN tgt USING (b)
        |), tot AS (
        |  SELECT sum(r) AS rtot, sum(tt) AS ttot FROM buckets
        |)
        |SELECT f.doc_id, CAST(sum(f.c) AS BIGINT) AS n_toks,
        |  round(sum(f.c * (ln((bk.tt + 0.5) / (t.ttot + 128.0)) - ln((bk.r + 0.5) / (t.rtot + 128.0)))), 4) AS logratio
        |FROM feats f JOIN buckets bk USING (b) CROSS JOIN tot t
        |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,
    "t18_domain_mix" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tk
        |  FROM documents
        |), by_src AS (
        |  SELECT source, CAST(sum(tk) AS BIGINT) AS src_tokens FROM tk GROUP BY source
        |), tot AS (
        |  SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
        |    count(*) AS n_src FROM by_src
        |), plan AS (
        |  SELECT source, src_tokens,
        |    CAST(floor(floor(total_tokens * 0.5) / n_src) AS BIGINT) AS target_tokens,
        |    CAST(floor(least(1.0, CAST(floor(floor(total_tokens * 0.5) / n_src) AS DOUBLE) / src_tokens) * 4096) AS BIGINT) AS thr
        |  FROM by_src CROSS JOIN tot
        |), kept AS (
        |  SELECT t.source, t.tk
        |  FROM tk t JOIN plan p USING (source)
        |  WHERE (t.doc_id * 2654435761) % 4096 < p.thr
        |)
        |SELECT p.source, p.src_tokens, p.target_tokens,
        |  count(*) AS kept_docs, CAST(sum(k.tk) AS BIGINT) AS kept_tokens,
        |  round(CAST(sum(k.tk) AS DOUBLE) / p.target_tokens, 4) AS fill_ratio
        |FROM kept k JOIN plan p USING (source)
        |GROUP BY p.source, p.src_tokens, p.target_tokens
        |ORDER BY p.source""".stripMargin,
    "t17_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS dl,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), scalars AS (
        |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM toks
        |), tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM toks)
        |  WHERE term IN ('spark', 'merge', 'vector')
        |  GROUP BY doc_id, dl, term
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS dfr FROM tf GROUP BY term
        |)
        |SELECT tf.doc_id,
        |  round(sum(ln(1.0 + (s.n_docs - d.dfr + 0.5) / (d.dfr + 0.5)) * tf.tf * (1.2 + 1.0)
        |    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))), 6) AS score,
        |  count(*) AS n_terms
        |FROM tf JOIN dfreq d USING (term) CROSS JOIN scalars s
        |GROUP BY tf.doc_id
        |ORDER BY score DESC, tf.doc_id
        |LIMIT 20""".stripMargin,
    "t16_paragraph_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0
        |      THEN '#P#subscribe to our newsletter for updates' ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0
        |      THEN '#P#all rights reserved contact support for help' ELSE '' END AS ptext
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, unnest(string_split(ptext, '#P#')) AS para FROM d
        |), c AS (
        |  SELECT para, count(DISTINCT doc_id) AS ndocs FROM p GROUP BY para
        |)
        |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(sum(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac,
        |  CAST(max(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS flag_boilerplate
        |FROM p JOIN c USING (para)
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "t14_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    ['alpha.example.com','beta.example.org','spamfarm.biz',
        |     'gamma.example.net','delta.example.com','adtracker.click',
        |     'epsilon.example.io','zeta.example.edu'
        |    ][CAST(doc_id % 8 AS INT) + 1] AS domain
        |  FROM documents
        |), b(bad) AS (VALUES ('spamfarm.biz'), ('adtracker.click'))
        |SELECT u.doc_id, u.domain,
        |  CAST(CASE WHEN b.bad IS NULL THEN 0 ELSE 1 END AS BIGINT) AS blocked
        |FROM u LEFT JOIN b ON u.domain = b.bad
        |ORDER BY doc_id""".stripMargin,
    "t13_decontaminate_embedding" ->
      """WITH x AS (
        |  SELECT a.vec_id AS eval_id,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 20 AND b.vec_id >= 20
        |)
        |SELECT eval_id, count(*) AS n_contaminated,
        |  max(round(cos, 4)) AS max_cos
        |FROM x WHERE round(cos, 6) >= 0.4
        |GROUP BY eval_id ORDER BY eval_id""".stripMargin,
    "t12_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
        |), counts AS (
        |  SELECT w, count(*) AS c FROM toks GROUP BY 1
        |), tot AS (
        |  SELECT sum(c) AS total FROM counts
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(c / CAST(total AS DOUBLE))), 6) AS avg_logp
        |FROM toks JOIN counts USING (w), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t11_repetition" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' $boiler' ELSE text END AS text
         |  FROM documents
         |), toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM d
         |), base AS (
         |  SELECT doc_id, greatest(len(w) - 2, 0) AS n_tri FROM toks
         |), sh AS (
         |  SELECT doc_id, count(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS n_distinct
         |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i) GROUP BY 1
         |), r AS (
         |  SELECT b.doc_id, b.n_tri, coalesce(sh.n_distinct, 0) AS n_distinct,
         |    CASE WHEN b.n_tri > 0
         |      THEN round(1 - coalesce(sh.n_distinct, 0) / CAST(b.n_tri AS DOUBLE), 6)
         |      ELSE 0.0 END AS rep_ratio
         |  FROM base b LEFT JOIN sh ON b.doc_id = sh.doc_id
         |)
         |SELECT doc_id, n_tri, n_distinct, rep_ratio,
         |  CAST(CASE WHEN rep_ratio > 0.15 THEN 1 ELSE 0 END AS BIGINT) AS flag_repetitive
         |FROM r ORDER BY doc_id""".stripMargin,
    "t01_lang_id" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(enStops)}, t))) AS en_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(deStops)}, t))) AS de_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(frStops)}, t))) AS fr_n,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(esStops)}, t))) AS es_n
         |  FROM documents
         |)
         |SELECT doc_id, en_n, de_n, fr_n, es_n,
         |  CASE WHEN en_n >= de_n AND en_n >= fr_n AND en_n >= es_n AND en_n > 0 THEN 'en'
         |       WHEN de_n >= fr_n AND de_n >= es_n AND de_n > 0 THEN 'de'
         |       WHEN fr_n >= es_n AND fr_n > 0 THEN 'fr'
         |       WHEN es_n > 0 THEN 'es'
         |       ELSE 'und' END AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin,
    "t02_quality_score" ->
      s"""WITH f AS (
         |  SELECT doc_id, length(text) AS len_chars,
         |    len(string_split(text, ' ')) AS n_words,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |    len(list_filter(string_split(text, ' '), t -> list_contains(${listLit(enStops)}, t))) AS n_stop
         |  FROM documents
         |)
         |SELECT doc_id, len_chars, n_words, n_distinct, n_stop,
         |  round((len_chars - n_words + 1) * 1.0 / n_words, 4) AS avg_word_len,
         |  round(n_distinct * 1.0 / n_words, 4) AS distinct_ratio,
         |  round(n_stop * 1.0 / n_words, 4) AS stop_ratio,
         |  round(0.4 * (n_distinct * 1.0 / n_words) +
         |        0.4 * (1.0 - n_stop * 1.0 / n_words) +
         |        0.2 * least(n_words * 1.0 / 100.0, 1.0), 4) AS quality
         |FROM f ORDER BY doc_id""".stripMargin,
    "t03_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), ' +')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
        |  length(text) AS len_chars,
        |  round(length(text) * 1.0 / len(string_split_regex(trim(text), ' +')), 4) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint,
        |  length(text) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t05_train_split" ->
      """WITH b AS (
        |  SELECT lang, length(text) AS len,
        |    substr(md5(text), 1, 1) AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 'c' THEN 'train'
        |            WHEN bucket IN ('c', 'd') THEN 'val'
        |            ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS n_chars_total
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t06_pack" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    sum(len(string_split(text, ' '))) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_tokens
        |  FROM documents
        |)
        |SELECT source, doc_id, n_tokens,
        |  CAST(floor((cum_tokens - n_tokens) / 512) AS BIGINT) AS pack_id
        |FROM t ORDER BY source, doc_id""".stripMargin,
    "t24_shard_pack" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents
        |)
        |SELECT CAST((cum - n_chars) // 100000 AS BIGINT) AS shard_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS shard_chars,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "t23_reservoir_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |) WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,
    "t07_stratified_sample" ->
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
        |      FROM documents)
        |WHERE (lang = 'en' AND bucket < '8')
        |   OR (lang <> 'en' AND bucket < '2')
        |ORDER BY doc_id""".stripMargin,
    "t09_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, hash(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
        |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)
        |)
        |SELECT e.doc_id AS eval_id, tr.doc_id AS train_id, count(*) AS shared_ngrams
        |FROM sh e JOIN sh tr ON e.h = tr.h
        |WHERE e.doc_id % 50 = 0 AND tr.doc_id % 50 <> 0
        |GROUP BY 1, 2
        |HAVING count(*) >= 5
        |ORDER BY 1, 2""".stripMargin,
    "t10_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(dirty, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(dirty, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM d ORDER BY doc_id""".stripMargin,
    "t08_top_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ngram
        |  FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)
        |), cnt AS (
        |  SELECT lang, ngram, count(*) AS df FROM sh GROUP BY 1, 2
        |), r AS (
        |  SELECT lang, ngram, df,
        |    row_number() OVER (PARTITION BY lang ORDER BY df DESC, ngram) AS rn
        |  FROM cnt
        |)
        |SELECT lang, ngram, df FROM r WHERE rn <= 3
        |ORDER BY lang, df DESC, ngram""".stripMargin)
}
