package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the
  * algorithm every modern tokenizer pipeline trains with; public
  * knowledge, original implementation).
  *
  * The scalable formulation is the standard one: BPE statistics live
  * on the WORD-FREQUENCY VOCABULARY, not the corpus — one corpus pass
  * builds (word, freq), and from then on every iteration's work is
  * vocab-sized (tens of thousands of rows) regardless of corpus size.
  * That is what makes the op viable at 100 TB: the corpus is touched
  * exactly once.
  *
  * Per merge step, all work is declarative:
  *  - adjacent symbol pairs via `zip_with` over two `slice`s of the
  *    symbol array (codegen'd, no UDF), exploded and summed by freq —
  *    one vocab-sized aggregation;
  *  - the argmax pair arrives as ONE driver row (TakeOrdered limit 1,
  *    with a (freq desc, pair asc) total order so ties are
  *    deterministic) — the same scalar-probe pattern as d07's
  *    convergence check, never a data collect;
  *  - the merge itself is a codegen'd `aggregate` fold over each
  *    word's symbol array (left-to-right, non-overlapping — the fold
  *    accumulator can't re-merge its own output, which is exactly
  *    BPE's replace semantics);
  *  - `localCheckpoint` truncates the per-iteration lineage (the
  *    vocab is small; the checkpoint is what keeps K iterations from
  *    nesting K aggregate expressions).
  *
  * BpeSpec proves the distributed trainer equals an in-memory
  * reference implementation on fixtures (including the classic
  * low/lower/newest/widest example) and checks merge-table invariants
  * on the real corpus.
  */
object Bpe {

  /** Split a word into single-character symbols (no end-of-word marker
    * — a documented simplification; adding one is a one-line change to
    * this expression and the reference impl).
    */
  private def charSymbols(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** Adjacent symbol pairs as (l, r) structs; empty for 1-symbol words. */
  private def pairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Left-to-right non-overlapping replacement of the (a, b) pair with
    * the merged symbol — BPE's replace step as a codegen'd fold. The
    * empty-accumulator branch comes FIRST so element_at(acc, -1) is
    * never evaluated on an empty array (CaseWhen branches evaluate
    * lazily in order; ANSI mode would otherwise error).
    */
  private def mergeExpr(a: String, b: String): Column =
    aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `k` merges over a (word, freq) vocabulary. Returns the merge
    * table: (step, left, right, merged, pair_freq).
    */
  def train(vocab0: DataFrame, k: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab = vocab0
      .withColumn("syms", charSymbols(col("word")))
      .select("syms", "freq")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 0
    var done = false
    while (step < k && !done) {
      val top = vocab
        .select(explode(pairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1)
        .collect() // ONE row: the argmax pair (scalar driver probe)
      if (top.isEmpty) done = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step + 1, l, r, l + r, f))
        val prev = vocab
        vocab = vocab.withColumn("syms", mergeExpr(l, r)).localCheckpoint()
        prev.unpersist()
        step += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** In-memory reference trainer — the spec's ground truth. Same
    * tiebreak ((freq desc, (l, r) asc)) as the distributed form, and
    * the SAME string order: Spark sorts strings by UTF-8 binary, while
    * Scala's default String order compares UTF-16 code units — the two
    * disagree for supplementary-plane symbols (a surrogate's code units
    * sort below 0xFFFF-range chars, its UTF-8 bytes above), so the
    * reference compares UTF-8 bytes explicitly. Symbol segmentation is
    * by CODE POINT for the same reason (Spark's `split` never halves a
    * surrogate pair; `String.map` would).
    */
  private val utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def codePointSymbols(w: String): List[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toList

  def trainReference(words: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.groupBy(w => codePointSymbols(w._1)).map { case (s, ws) => s -> ws.values.sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    implicit val argmaxOrder: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order)
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }(argmaxOrder)
        merges += ((step, l, r, l + r, f))
        def rep(s: List[String]): List[String] = s match {
          case a :: b :: rest if a == l && b == r => (l + r) :: rep(rest)
          case a :: rest => a :: rep(rest)
          case Nil => Nil
        }
        vocab = vocab.groupBy { case (s, _) => rep(s) }
          .map { case (s, vs) => s -> vs.values.sum }
      }
    }
    merges.toSeq
  }

  /** Apply a trained merge table to one word, in training order — the
    * standard BPE ENCODE step (each merge is the same left-to-right
    * non-overlapping replacement the trainer used). Public so the
    * distributed encoder's kernel and BpeSpec's reference check share
    * one definition.
    */
  def applyMerges(word: String, merges: Seq[(String, String)]): List[String] = {
    var syms = codePointSymbols(word)
    merges.foreach { case (l, r) =>
      def rep(s: List[String]): List[String] = s match {
        case a :: b :: rest if a == l && b == r => (l + r) :: rep(rest)
        case a :: rest => a :: rep(rest)
        case Nil => Nil
      }
      syms = rep(syms)
    }
    syms
  }

  /** `t22_bpe_encode`: tokenize the corpus under the TRAINED merges —
    * the apply half of BPE next to t15's train half (a corpus build
    * reports its token budget in model tokens, not whitespace words).
    * Scale shape — the vocabulary trick: the merge loop is inherently
    * sequential PER WORD, so each DISTINCT word is encoded exactly
    * once in a batched kernel with the k-entry merge table broadcast
    * (O(vocab·k), never O(corpus·k)), and the corpus-sized side is one
    * equi-join of per-(doc, word) counts against the encoded vocab
    * followed by a per-doc fold. Rows-only key (the merge iteration is
    * not ANSI-expressible — t15's rule); BpeSpec proves the kernel
    * equals the in-memory reference encoder on every corpus word and
    * pins the token-count invariants.
    */
  /** The trained merge table, mined once per sf dir and staged as
    * parquet (the d07 stagedPairs pattern): TRAINING is t15's own bench
    * key, and in production the merge table IS a published artifact the
    * encoder loads — re-training inside every encode invocation timed
    * the wrong operator (15 driver-synchronized argmax iterations per
    * run). A stale or half-written stage is rebuilt, never trusted.
    */
  private def stagedMerges(s: SparkSession, dir: String, k: Int): Seq[(String, String)] = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    // keyed on k too: a caller training fewer merges (BpeSpec's k=6)
    // must not read back a longer staged table
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/bpe_merges_t22${tag}_k$k"
    graft.StagedFixture.ensure(s, path, "G1", Seq(k)) {
      val vocab = docs(s, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .where(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val trained = train(vocab, k)
      import s.implicits._
      trained.toDF("step", "left", "right", "merged", "pair_freq")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    }
    s.read.parquet(s"$path/merges").orderBy("step")
      .collect().map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
  }

  def t22BpeEncode(s: SparkSession, dir: String, k: Int = 15): DataFrame = {
    import s.implicits._
    val docWords = docs(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = docWords.groupBy("word").agg(sum("cnt").as("freq"))
    val merges = stagedMerges(s, dir, k)
    val enc = vocab.select(col("word")).as[String]
      .mapPartitions(_.map(w => (w, applyMerges(w, merges).length.toLong)))
      .toDF("word", "n_toks")
    docWords.join(enc, "word")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("cnt") * col("n_toks")).cast("long").as("n_bpe_tokens"),
        sum(col("cnt") * length(col("word"))).cast("long").as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_chars") / col("n_bpe_tokens"), 4).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** `t15_bpe_train`: one corpus pass builds the word-frequency vocab
    * (whitespace tokens, lowercased), then 15 BPE merges train on it.
    * Output = the learned merge table in training order — rows-only
    * (the iteration is not ANSI-SQL-expressible); BpeSpec carries the
    * correctness burden via the reference-equality property.
    */
  def t15BpeTrain(s: SparkSession, dir: String, k: Int = 15): DataFrame = {
    import s.implicits._
    val vocab = docs(s, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    train(vocab, k)
      .toDF("step", "left", "right", "merged", "pair_freq")
      .withColumn("step", col("step").cast("long"))
      .orderBy("step")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("t15_bpe_train" -> ((s, dir) => t15BpeTrain(s, dir)),
      "t22_bpe_encode" -> ((s, dir) => t22BpeEncode(s, dir)))

  val oracles: Map[String, String] = Map.empty
}
