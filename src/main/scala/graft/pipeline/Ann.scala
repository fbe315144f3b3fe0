package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.functions.{cosine_sim, lsh_bucket}

/** Similarity search over the embedding column (SURVEY §2 C6-C7).
  *
  * s01 is the exact baseline: broadcast the (small) query set across the
  * scan — the corpus side is never shuffled until the per-query top-k.
  * s02 is the 100 TB path: multi-table random-hyperplane LSH turns the
  * n×m score matrix into per-bucket equi-join candidates; recall is
  * tuned by (tables × bits) and measured in AnnSpec against s01.
  */
object Ann {

  val K = 10          // neighbors per query
  val NQueries = 10   // query vectors: vec_id < 10

  /** The shared top-k tail of the whole ANN family (s01/s02/s03): the
    * scored candidate stream runs through the bounded-heap TopKPerGroup
    * operator (the B25 custom physical operator — per-task heaps emit at
    * most k rows per (query, task), so the shuffle carries
    * O(k·queries·tasks) rows instead of EVERY scored row riding a hash
    * exchange into per-group window sorts). The rank column comes from
    * the operator's own sorted drain (`rankCol`) — position in the final
    * per-group emit IS the rank — so no Sort/Window node re-derives it.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import graft.plans.TopK
    // rank comes from the operator's own sorted drain (rankCol) — no
    // Sort+Window re-rank over the already-k-bounded stream.
    TopK.perGroup(scored, Seq("q_id"), Seq(("cos", false), ("vec_id", true)), k,
        rankCol = Some("rank"))
      .select(col("q_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** Exact per-query top-k over any (vec_id, embedding) corpus: the
    * query set broadcasts across the scan, the codegen cosine scores
    * inside whole-stage codegen, and the bounded-heap tail bounds output.
    */
  def annExactOn(e: DataFrame, nQueries: Int = NQueries, k: Int = K): DataFrame = {
    val q = e.where(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    topKPerQuery(
      e.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine_sim(col("embedding"), col("q_vec"))),
      k)
  }

  /** BATCHED exact top-k: every vector in a QUERY TABLE against a
    * corpus, one declarative plan (the table-to-table form the
    * per-vector CALLs can't reach). Queries broadcast in hash chunks
    * of ≤ `chunkRows` — each chunk is its own broadcast-crossJoin
    * branch over the SAME corpus scan shape, so query-set size bounds
    * executor memory per branch (chunkRows · dim · 8B), never the
    * plan. Per-query top-k is chunk-local (a query lives in exactly
    * one hash chunk), so the union needs no re-rank. Self-matches are
    * NOT excluded: corpus and queries are distinct tables with
    * unrelated id spaces; a query vector present in the corpus ranks
    * itself first at cos 1.0 — the production retrieval semantic
    * (same contract as the s14 CALL).
    */
  def annJoinOn(corpus: DataFrame, queries: DataFrame, k: Int,
                nChunks: Int = 1): DataFrame = {
    require(k >= 1, s"annJoinOn requires k >= 1, got $k")
    require(nChunks >= 1, s"annJoinOn requires nChunks >= 1, got $nChunks")
    val e = corpus.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("vec_id").cast("long").as("q_id"),
      col("embedding").as("q_vec"))
    (0 until nChunks).map { c =>
      val qc = if (nChunks == 1) q
               else q.where(pmod(hash(col("q_id")), lit(nChunks)) === lit(c))
      topKPerQuery(
        e.crossJoin(broadcast(qc))
          .withColumn("cos", cosine_sim(col("embedding"), col("q_vec"))),
        k)
    }.reduce(_ unionByName _)
  }

  /** C6: exact top-k cosine neighbors. Plan: parquet scan →
    * BroadcastNestedLoopJoin against the broadcast query set → codegen
    * cosine (custom expression) → rank window partitioned by query.
    * The only shuffle carries (corpus × queries) scored rows hashed on
    * q_id; at scale, chunk the query set and/or pre-prune with an
    * approximate similarity threshold before the window.
    */
  def s01AnnBruteforce(s: SparkSession, dir: String): DataFrame =
    annExactOn(emb(s, dir))

  /** C48 `s10_ann_range`: RANGE (radius) search — every neighbor with
    * cosine ≥ θ, the other standing vector-store verb next to top-k
    * (dedup-threshold mining, "all matches above 0.8" retrieval). The
    * shape is CHEAPER than s01 at scale: the threshold is a plain
    * filter on the scored scan, so there is no rank window and no
    * shuffle at all — queries broadcast, the corpus streams through
    * codegen cosine + filter, and survivors exit. Result size is
    * data-dependent (unlike top-k's k·|queries| bound); at 100 TB a θ
    * chosen too low is a result-size problem, not a plan problem. On
    * the ANN paths the same threshold prunes inside the bucket scan.
    */
  def s10AnnRange(s: SparkSession, dir: String, theta: Double = 0.3,
                  nQueries: Int = NQueries): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    e.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("embedding"), col("q_vec")))
      .where(col("cos") >= theta)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "neighbor_id")
  }

  /** C35 `s08_ann_filtered`: FILTERED vector search — top-k neighbors
    * subject to a metadata predicate, the query shape every production
    * vector store serves ("nearest docs WHERE lang = …"). This is the
    * PRE-filter form: the predicate lands on the corpus SCAN
    * (PushedFilters — non-matching vectors are never read, never
    * scored), queries stay unfiltered, and the top-k heap sees only
    * eligible candidates — unlike post-filtering, which can return
    * fewer than k rows after discarding. At index scale the same
    * predicate composes with the ANN paths: it prunes IVF lists before
    * probing (s03/s06) or the codes scan before ADC (s05); here the
    * exact form is the DuckDB-checkable contract those share.
    */
  /** C40 `s09_hybrid_rrf`: HYBRID retrieval — the lexical leg (BM25,
    * t17's scorer) and the vector leg (exact cosine, s01's scorer)
    * fused by Reciprocal Rank Fusion, rrf(d) = Σ_legs 1/(60 + rank_d)
    * (Cormack/Clarke/Büttcher 2009; the standard production hybrid —
    * RRF needs no score calibration across legs, only ranks). Corpus =
    * documents⋈embeddings on id (items having both representations);
    * query = fixed terms for the lexical leg + item 0's embedding for
    * the vector leg, item 0 excluded from both.
    *
    * Scale shape: each leg independently reduces to its TOP-100 via
    * TakeOrdered (distributed heads, no global sort — the rank window
    * then runs over ≤100 rows); the lexical leg shuffles only matching
    * postings (t17's shape), the vector leg broadcasts one query
    * vector over the scan (s01's shape), and the fusion is a join of
    * two 100-row lists. Nothing corpus-sized crosses a window or a
    * join build side.
    */
  def s09HybridRrf(s: SparkSession, dir: String, k: Int = 20,
                   legTop: Int = 100, rrfK: Int = 60): DataFrame = {
    val query = Seq("spark", "merge", "vector")
    val (k1, b) = (1.2, 0.75)
    val corpus = docs(s, dir).select(col("doc_id"), col("text"))
      .join(emb(s, dir).select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .where(col("doc_id") =!= 0L)

    // lexical leg — t17's BM25 over the joined corpus
    val toks = corpus.select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val scalars = toks.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(query: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct("doc_id").as("dfr"))
    val lexTop = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(scalars))
      .withColumn("part",
        log(lit(1.0) + (col("n_docs") - col("dfr") + 0.5) / (col("dfr") + 0.5)) *
          col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("part").as("bm25"))
      .orderBy(desc("bm25"), col("doc_id")).limit(legTop)
      // single-partition window is BOUNDED: runs on the ≤legTop rows
      // the limit above already collected (rank assignment, not a scan)
      .withColumn("rank_lex",
        row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
      .select(col("doc_id"), col("rank_lex"))

    // vector leg — one broadcast query vector over the corpus scan
    val qv = emb(s, dir).where(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"))
    val vecTop = corpus.crossJoin(broadcast(qv))
      .withColumn("cos", cosine_sim(col("embedding"), col("q_vec")))
      .select(col("doc_id"), col("cos"))
      .orderBy(desc("cos"), col("doc_id")).limit(legTop)
      // bounded as above: ≤legTop rows
      .withColumn("rank_vec",
        row_number().over(Window.orderBy(desc("cos"), col("doc_id"))))
      .select(col("doc_id"), col("rank_vec"))

    lexTop.join(vecTop, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_vec")), lit(0.0)), 6))
      .select(col("doc_id"),
        coalesce(col("rank_lex"), lit(-1)).cast("long").as("rank_lex"),
        coalesce(col("rank_vec"), lit(-1)).cast("long").as("rank_vec"),
        col("rrf_score"))
      .orderBy(desc("rrf_score"), col("doc_id")).limit(k)
  }

  def s08AnnFiltered(s: SparkSession, dir: String, label: Int = 2): DataFrame =
    annExactFilteredOn(emb(s, dir), col("label") === label)

  /** Exact pre-filtered top-k — s08's shape over any corpus/predicate:
    * the predicate lands on the corpus SCAN (PushedFilters), queries
    * stay unfiltered. Also the ground truth the filtered INDEX paths
    * (s12 / the IVFPQ composition) are recall-gated against.
    */
  def annExactFilteredOn(e: DataFrame, pred: Column,
                         nQueries: Int = NQueries, k: Int = K): DataFrame = {
    val q = e.where(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    topKPerQuery(
      e.where(pred) // pushed to the parquet scan
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine_sim(col("embedding"), col("q_vec"))),
      k)
  }

  /** LSH candidate pairs (q_id, q_vec, vec_id, embedding) for any
    * corpus. MULTI-PROBE: each query probes its own bucket plus every
    * 1-bit-flip neighbor (bits+1 probes per table) — a near-miss on one
    * hyperplane no longer costs the whole table. The probe fan-out is
    * QUERY-side only (queries are the small broadcast side); the corpus
    * index stays one bucket per table, so at 100 TB multi-probe buys
    * ~bits× candidate coverage for zero extra corpus shuffle or index
    * size — the standard trade (Lv et al. 2007, multi-probe LSH) that
    * lets table count stay low.
    */
  def annLshCandidates(e: DataFrame, nQueries: Int = NQueries,
                       tables: Int = 16, bits: Int = 6,
                       multiProbe: Boolean = true): DataFrame = {
    def bucketed(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(col(idCol), col(vecCol),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lsh_bucket(col(vecCol), bits, 1000L + t).as("bkt"))): _*)).as("tb"))
        .select(col(idCol), col(vecCol), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))

    val corpus = bucketed(e.select(col("vec_id"), col("embedding")), "vec_id", "embedding")
    val queries0 = bucketed(
      e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      "q_id", "q_vec")
    val queries =
      if (!multiProbe) queries0
      else queries0
        .withColumn("bkt", explode(array(
          col("bkt") +: (0 until bits).map(i => col("bkt").bitwiseXOR(lit(1 << i))): _*)))

    corpus.join(broadcast(queries), Seq("tbl", "bkt"))
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "q_vec", "vec_id", "embedding")
      .dropDuplicates("q_id", "vec_id")
  }

  /** Exact-cosine top-k over the LSH candidate set. */
  def annLshOn(e: DataFrame, nQueries: Int = NQueries, k: Int = K,
               tables: Int = 16, bits: Int = 6,
               multiProbe: Boolean = true): DataFrame =
    topKPerQuery(
      annLshCandidates(e, nQueries, tables, bits, multiProbe)
        .withColumn("cos", cosine_sim(col("embedding"), col("q_vec"))),
      k)

  /** C7: approximate NN via multi-probe random-hyperplane LSH: 16
    * tables × 6-bit buckets, each query probing its bucket + the 6
    * 1-bit neighbors. Candidate generation is an equi-join on
    * (table, bucket) — linear shuffle, corpus scanned once, never
    * paired all-against-all. Exact cosine + top-k then run on
    * candidates only. Same output shape as s01; AnnSpec holds recall
    * gates on both the uniform-random corpus (adversarial) and a
    * clustered corpus (the regime ANN is used in), with the scored
    * fraction reported.
    */
  def s02AnnLsh(s: SparkSession, dir: String,
                tables: Int = 16, bits: Int = 6): DataFrame =
    annLshOn(emb(s, dir), tables = tables, bits = bits)

  /** C7b: IVF (inverted-file) ANN — the other standard scale path.
    * Coarse quantizer: TRAINED centroids (k-means|| init + spherical
    * Lloyd, [[trainCentroids]] — staged per corpus like the PQ index;
    * nlist adapts to corpus size via [[adaptiveNlist]]). Every corpus
    * vector is assigned to its nearest centroid (broadcast argmax —
    * one scan, no shuffle); a query probes only its `nprobe` nearest
    * centroid lists (nprobe scales as nlist/4, holding the scored
    * fraction ≈ 25% as nlist grows), so the scored set is
    * ~nprobe/nlist of the corpus. All joins are equi-joins on centroid
    * id; AnnSpec holds the recall + scored-fraction gates vs s01.
    */
  def s03AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val cents = ivfCentroidsStaged(s, dir)
    val nlist = cents.count().toInt
    annIvfWith(emb(s, dir), cents, nprobe = math.max(4, nlist / 4))
  }

  /** Deterministic coarse centroids WITHOUT a driver-side count: the
    * `nlist` vectors smallest by id-hash — a seeded pseudo-random draw
    * that costs ONE TakeOrdered scan (bounded heap per partition),
    * replacing the count-scan + stride-filter-scan pair the previous
    * stride seed needed. cid assignment is a row_number over the
    * already-limited nlist rows (single tiny partition).
    */
  private def hashDrawCentroids(e: DataFrame, nlist: Int): DataFrame =
    e.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist)
      // single-partition window is BOUNDED: ≤nlist (≤256) seed rows —
      // dense cid numbering, not a corpus scan
      .select(
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int").as("cid"),
        col("embedding").as("c_vec"))

  /** Nearest-`rank` coarse centroids per vector (broadcast argmin over
    * the tiny centroid set) — the IVF partition/probe step.
    */
  private def coarseAssign(cents: DataFrame, df: DataFrame,
                           idCol: String, vecCol: String, rank: Int): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("c_cos").desc, col("cid"))
    df.crossJoin(broadcast(cents))
      .withColumn("c_cos", cosine_sim(col(vecCol), col("c_vec")))
      .withColumn("c_rank", row_number().over(w))
      .where(col("c_rank") <= rank)
      .drop("c_vec", "c_cos", "c_rank")
  }

  /** IVF over any (vec_id, embedding) corpus — see [[s03AnnIvf]]. */
  def annIvfOn(e: DataFrame, nlist: Int = 16, nprobe: Int = 4,
               nQueries: Int = NQueries, k: Int = K,
               corpusPred: Option[Column] = None): DataFrame =
    annIvfWith(e, hashDrawCentroids(e, nlist), nprobe, nQueries, k, corpusPred)

  /** IVF probe against an EXPLICIT centroid set (hash-drawn or
    * k-means||-trained) — the search half, shared by both quantizers.
    */
  def annIvfWith(e: DataFrame, cents: DataFrame, nprobe: Int,
                 nQueries: Int = NQueries, k: Int = K,
                 corpusPred: Option[Column] = None): DataFrame = {
    // s08's pre-filter contract COMPOSED with the index path: the
    // metadata predicate lands on the CORPUS side before coarse
    // assignment and list scoring — ineligible vectors filter at the
    // scan (PushedFilters), are never assigned, never scored, never
    // heap-compared — while queries stay unfiltered; the top-k heap
    // sees only eligible candidates (pre-filter, not post-filter)
    val src = corpusPred.fold(e)(p => e.where(p))
    val corpus = coarseAssign(cents, src.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", 1)
    val queries = coarseAssign(cents,
      e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      "q_id", "q_vec", nprobe)

    topKPerQuery(
      corpus.join(broadcast(queries), Seq("cid"))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine_sim(col("embedding"), col("q_vec"))),
      k)
  }

  /** (query, corpus-vector) candidate count under an IVF probe — the
    * scored-fraction witness AnnSpec gates (mirror of
    * [[annLshCandidates]]).
    */
  private[graft] def annIvfCandidates(e: DataFrame, cents: DataFrame,
                                      nprobe: Int, nQueries: Int = NQueries,
                                      corpusPred: Option[Column] = None): Long = {
    val corpus = coarseAssign(cents,
      corpusPred.fold(e)(p => e.where(p)).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", 1).select("vec_id", "cid")
    val queries = coarseAssign(cents,
      e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      "q_id", "q_vec", nprobe).select("q_id", "cid")
    corpus.join(broadcast(queries), Seq("cid"))
      .where(col("vec_id") =!= col("q_id")).count()
  }

  /** The lake-serving IVF index over any (vec_id, embedding) corpus:
    * k-means||-trained centroids + per-vector coarse assignment — the
    * two tables `CALL graft.system.ann_index_ivf` publishes. Stored
    * with the assignment table CLUSTERED BY cid, each coarse list
    * becomes a stat-tight file run and a probe's `cid IN (…)` read
    * opens only probed-list files: the inverted list realized as lake
    * layout, no new read machinery.
    */
  def ivfIndexBuild(e: DataFrame, nlist: Int): (DataFrame, DataFrame) = {
    val cents = trainCentroids(e.select(col("vec_id"), col("embedding")), nlist)
    (cents, ivfAssign(cents, e))
  }

  /** Coarse-assign a batch against an EXISTING centroid set — the
    * incremental half of the index lifecycle (`CALL
    * graft.system.ann_index_append`): broadcast argmin, batch-only
    * cost, the corpus never reshuffles. ALL source columns ride into
    * the output (cid first): the clustered copy IS the inverted list,
    * and metadata columns stay filterable inside probed lists (the
    * s12 pre-filter contract for the search CALL's _where form).
    */
  def ivfAssign(cents: DataFrame, e: DataFrame): DataFrame =
    coarseAssign(cents, e, "vec_id", "embedding", 1)
      .select((col("cid") +: e.columns.map(col(_))).toSeq: _*)

  /** The d11 sizing recipe applied to the coarse quantizer: grow nlist
    * with the corpus so EXPECTED LIST SIZE stays ~64 (probe cost per
    * list constant; list count absorbs corpus growth), capped at 256
    * (past that, nprobe — not nlist — is the recall knob at these
    * dimensionalities; FAISS guidance, public).
    */
  private[graft] def adaptiveNlist(n: Long): Int =
    math.max(16L, math.min(256L, n / 64L)).toInt

  /** k-means|| initialization + distributed spherical-Lloyd refinement
    * for the IVF coarse quantizer (Bahmani et al. 2012 "Scalable
    * k-means++", public — the init FAISS-scale systems use; replaces
    * the unrefined hash draw, whose centroids ignore corpus geometry).
    * Scale shape, every step:
    *
    *  1. SEED: the hash-min vector (one TakeOrdered scan).
    *  2. `rounds` oversampling passes: each point's cost = spherical
    *     distance (1 − max cos) to the CURRENT candidate set (one
    *     broadcast-join scan), sampled with probability
    *     min(1, ℓ·nlist·cost/φ) under a DETERMINISTIC hash-uniform
    *     (xxhash64(vec_id, round) — reproducible, no RNG state). φ is
    *     one scalar probe per round (the documented 1-row exception
    *     class). Candidate set ≈ rounds·ℓ·nlist vectors — thousands,
    *     never corpus-sized.
    *  3. WEIGHTS: one broadcast-argmax pass counts each candidate's
    *     basin (partial-agg max_by — no window).
    *  4. DRIVER REDUCTION of the tiny weighted candidate set to nlist
    *     centers: greedy weighted farthest-point (the deterministic
    *     k-means++ stand-in) + local weighted Lloyd — O(cand²·dim)
    *     driver arithmetic on ~10³ rows, the k-means|| paper's own
    *     final step.
    *  5. `lloydIters` DISTRIBUTED spherical Lloyd passes: broadcast
    *     argmax assignment (max_by, map-side combined) + the vec_mean
    *     custom aggregate; an emptied centroid keeps its vector (the
    *     pqIndex rule) so cid stays dense.
    *
    * The corpus is never shuffled; every join is a broadcast of a
    * centroid/candidate-sized side.
    */
  private[graft] def trainCentroids(e0: DataFrame, nlist: Int,
                                    lloydIters: Int = 2,
                                    oversample: Int = 4,
                                    rounds: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    import graft.functions.VecMeanAgg.vec_mean
    val s = e0.sparkSession
    val l2 = sqrt(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x))
    val e = e0.select(col("vec_id"),
        transform(col("embedding"), x => (x / l2).cast("float")).as("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // every cache this training run pins is released before return —
    // repeated index builds (per-dir staging, ann_index_ivf CALLs)
    // must not accumulate dead blocks for the life of the session
    val pinned = scala.collection.mutable.ArrayBuffer[DataFrame](e)

    var cand = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_vec"))
    for (r <- 1 to rounds) {
      val bc = cand.select(col("c_vec")).persist(StorageLevel.MEMORY_AND_DISK)
      pinned += bc
      val cost = e.crossJoin(broadcast(bc))
        .withColumn("c_cos", cosine_sim(col("embedding"), col("c_vec")))
        .groupBy("vec_id")
        .agg(first(col("embedding")).as("embedding"), max(col("c_cos")).as("best"))
        .withColumn("cost", greatest(lit(0.0), lit(1.0) - col("best")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pinned += cost
      val phi = math.max(cost.agg(sum("cost")).head().getDouble(0), 1e-12)
      val u = (abs(xxhash64(col("vec_id"), lit(r))).cast("double")
        / lit(Long.MaxValue.toDouble))
      val drawn = cost
        .where(u < least(lit(1.0), col("cost") * (oversample.toDouble * nlist) / phi))
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_vec"))
      cand = cand.unionByName(drawn)
    }
    val weighted = {
      val w = e.crossJoin(broadcast(cand))
        .withColumn("c_cos", cosine_sim(col("embedding"), col("c_vec")))
        .groupBy("vec_id")
        .agg(max_by(col("cand_id"), struct(col("c_cos"), -col("cand_id"))).as("cand_id"))
        .groupBy("cand_id").agg(count(lit(1)).as("w"))
      cand.join(w, Seq("cand_id"), "left").na.fill(0L, Seq("w"))
        .collect().map(r => (r.getLong(0),
          r.getSeq[Float](1).toArray, r.getLong(2)))
        .sortBy(_._1)
    }

    // driver-side weighted reduction (candidates ~10³): greedy weighted
    // farthest-point, then local weighted spherical Lloyd
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val first0 = weighted.maxBy(c => (c._3, -c._1))
    chosen += first0._2
    while (chosen.size < math.min(nlist, weighted.length)) {
      val next = weighted.maxBy { c =>
        val d = 1.0 - chosen.map(ch => cos(c._2, ch)).max
        (c._3 * d, -c._1) // weight × spherical distance; id breaks ties
      }
      chosen += next._2
    }
    val centers = chosen.map(_.map(_.toDouble)).toArray
    for (_ <- 0 until 3) {
      val sums = Array.fill(centers.length)(new Array[Double](centers(0).length))
      val ws = new Array[Double](centers.length)
      weighted.foreach { case (_, v, w) =>
        var (bi, bc) = (0, -2.0)
        centers.indices.foreach { i =>
          val c = cos(v, centers(i).map(_.toFloat))
          if (c > bc) { bc = c; bi = i }
        }
        ws(bi) += w.toDouble
        v.indices.foreach(j => sums(bi)(j) += v(j) * w)
      }
      centers.indices.foreach { i =>
        if (ws(i) > 0) centers(i) = sums(i).map(_ / ws(i))
      }
    }

    var cents = s.createDataFrame(
      s.sparkContext.parallelize(
        centers.toIndexedSeq.zipWithIndex.map { case (v, i) =>
          org.apache.spark.sql.Row(i, v.map(_.toFloat).toSeq) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c_vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    for (_ <- 0 until lloydIters) {
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("c_cos", cosine_sim(col("embedding"), col("c_vec")))
        .groupBy("vec_id")
        .agg(max_by(struct(col("cid"), col("embedding")),
          struct(col("c_cos"), -col("cid"))).as("a"))
        .select(col("a.cid").as("cid"), col("a.embedding").as("embedding"))
      val updated = assigned.groupBy("cid")
        .agg(vec_mean(col("embedding"), 64).as("m"))
        .select(col("cid"), transform(col("m"), _.cast("float")).as("c_vec"))
      cents = updated.unionByName(
        cents.join(updated.select("cid"), Seq("cid"), "left_anti"))
    }
    // MATERIALIZE the result (≤ nlist ≤ 256 rows — a quantizer is a
    // driver-small artifact) so every training cache can be released
    // NOW: the lazy Lloyd plan still references `e`, and returning it
    // unpersisted-later would leave this run's blocks pinned for the
    // session (repeated builds OOM-pressure executors)
    val schema = cents.schema
    val rows = cents.collect().toIndexedSeq
    pinned.foreach(_.unpersist(false))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  /** The TRAINED coarse quantizer staged once per sf dir (the PQ-index
    * pattern: in production the quantizer IS a maintained artifact;
    * retraining per query batch would time training, not search).
    * nlist adapts to the corpus ([[adaptiveNlist]] — the one count
    * here is paid once at staging).
    */
  private[graft] def ivfCentroidsStaged(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/ivf_cents_$tag"
    graft.StagedFixture.ensure(s, path, "G1") {
      val e = emb(s, dir)
      trainCentroids(e, adaptiveNlist(e.count()))
        .write.mode("overwrite").parquet(s"$path/cents")
    }
    s.read.parquet(s"$path/cents")
  }

  /** C22 s05: product-quantization ANN (ADC + exact re-rank) — the
    * memory-scale path. A 100 TB embedding corpus cannot keep float
    * vectors hot: PQ splits each (L2-normalized) vector into `m`
    * subvectors, learns a `ksub`-centroid codebook per subspace (Lloyd
    * iterations on subvectors — the s04 vec_mean aggregate is the
    * update step), and stores each vector as `m` small codes: 8 bytes
    * against 256 for 64 floats, a 32× compression of the scan set.
    * Queries score against CODES ONLY via ADC (asymmetric distance
    * computation): per query, one m×ksub lookup table of
    * subvector·centroid inner products (ksub·m tiny dot products, not
    * corpus work), then every corpus vector's approximate cosine is m
    * array lookups — no float vector is touched during the scan. The
    * ADC top-`shortlist` per query (bounded-heap operator) is then
    * re-ranked with the EXACT cosine by joining the original vectors
    * back (broadcast of the k'·queries shortlist — the only rows whose
    * floats are ever read). Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011.
    *
    * Same output shape as s01; AnnSpec gates recall on the clustered
    * corpus and the code-compression invariants.
    */
  def annPqOn(e: DataFrame, m: Int = 8, ksub: Int = 16, shortlist: Int = 100,
              nQueries: Int = NQueries, k: Int = K, iters: Int = 2,
              index: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (codebook, codes) = index.getOrElse(pqIndex(e, m, ksub, iters))
    val lut = pqLut(e, codebook, nQueries, m)
    // full ADC scan: every corpus code vector × every query
    val pairs = codes.crossJoin(broadcast(lut))
      .where(col("vec_id") =!= col("q_id"))
    adcRerank(e, pairs, m, ksub, shortlist, nQueries, k)
  }

  def s05AnnPq(s: SparkSession, dir: String): DataFrame =
    annPqOn(emb(s, dir), index = Some(pqIndexStaged(s, dir)))

  /** The PQ index staged once per sf dir (codebook + code table as
    * parquet, marker-gated — the staged-fixture pattern): in production
    * the PQ index IS a maintained table; retraining codebooks on every
    * query batch would time index construction, not search. AnnSpec
    * still trains live (it feeds synthetic corpora).
    */
  private def pqIndexStaged(s: SparkSession, dir: String,
                            m: Int = 8, ksub: Int = 16, iters: Int = 2): (DataFrame, DataFrame) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/pq_index_${m}_$ksub$tag"
    graft.StagedFixture.ensure(s, path, "G1", Seq(m, ksub, iters)) {
      val (cb, codes) = pqIndex(emb(s, dir), m, ksub, iters)
      cb.write.mode("overwrite").parquet(s"$path/codebook")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    }
    (s.read.parquet(s"$path/codebook"), s.read.parquet(s"$path/codes"))
  }

  /** C25 s06: IVF+PQ — the two scale paths COMPOSED, the canonical
    * big-corpus ANN design (FAISS IVFPQ; Jégou et al. 2011 §V). IVF
    * bounds WHO gets scored (only the ~nprobe/nlist of the corpus in
    * probed coarse lists); PQ bounds WHAT scoring costs (m byte-code
    * lookups against an 8-byte vector instead of a 64-float dot
    * product, 32× less state hot). Exact cosine then re-ranks only the
    * shortlist. Every join is an equi-join on cid or a broadcast of
    * query-sized sides; the corpus is never shuffled.
    */
  def annIvfPqOn(e: DataFrame, nlist: Int = 16, nprobe: Int = 4,
                 m: Int = 8, ksub: Int = 16, shortlist: Int = 100,
                 nQueries: Int = NQueries, k: Int = K, iters: Int = 2,
                 index: Option[(DataFrame, DataFrame)] = None,
                 coarse: Option[DataFrame] = None,
                 corpusPred: Option[Column] = None): DataFrame = {
    val cents = coarse.getOrElse(hashDrawCentroids(e, nlist))
    val (codebook, codes) = index.getOrElse(pqIndex(e, m, ksub, iters))
    // the IVFPQ index: (cid, vec_id, codes) — coarse list + byte codes.
    // corpusPred = s08's pre-filter on the CODES SCAN: ineligible
    // vectors drop before the probe join, so neither their ADC lookups
    // nor their shortlist slots are ever spent (queries unfiltered;
    // the exact re-rank inherits the already-filtered shortlist)
    val srcIdx = corpusPred.fold(e)(p => e.where(p))
    val corpusIdx = coarseAssign(cents, srcIdx.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 1)
      .select("vec_id", "cid")
      .join(codes, "vec_id")
    val probes = coarseAssign(cents,
        e.where(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        "q_id", "q_vec", nprobe)
      .select("q_id", "cid")
    val lut = pqLut(e, codebook, nQueries, m)
    val pairs = corpusIdx.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("q_id"))
      .join(broadcast(lut), "q_id")
    adcRerank(e, pairs, m, ksub, shortlist, nQueries, k)
  }

  /** C65 `s12_ann_filtered_ivf`: FILTERED vector search ON THE INDEX
    * PATHS — s08 proved the pre-filter contract on the exact scan;
    * this key composes the same predicate with the trained-IVF probe
    * (and AnnSpec gates the IVFPQ composition): the filter lands on
    * the corpus side BEFORE coarse assignment and list scoring, so
    * the scored set is (eligible ∩ probed lists) — strictly cheaper
    * than unfiltered IVF, never a post-filter that starves the heap.
    * Rows-only (approximate result — no ANSI oracle); AnnSpec holds
    * the recall-vs-exact-filtered and scored-fraction gates at 1-in-3
    * selectivity on both s03's and s06's paths.
    */
  def s12AnnFilteredIvf(s: SparkSession, dir: String): DataFrame = {
    val cents = ivfCentroidsStaged(s, dir)
    val nlist = cents.count().toInt
    annIvfWith(emb(s, dir), cents, nprobe = math.max(4, nlist / 4),
      corpusPred = Some(col("label") < 3))
  }

  def s06AnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val cents = ivfCentroidsStaged(s, dir)
    annIvfPqOn(emb(s, dir), index = Some(pqIndexStaged(s, dir)),
      coarse = Some(cents), nprobe = math.max(4, cents.count().toInt / 4))
  }

  /** Encode a batch of vectors against an EXISTING codebook — the
    * incremental half of index maintenance (FAISS `add`): no
    * retraining, just the same broadcast-argmin assignment the trainer
    * uses, so per-batch cost is O(batch·m·ksub) tiny dot products and
    * the codebook stays immutable (queries in flight keep a consistent
    * ADC table).
    */
  private[graft] def pqEncode(batch: DataFrame, codebook: DataFrame,
                              m: Int = 8): DataFrame = {
    def sqdist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, z) => acc + z)
    pqSubvecs(pqNormalize(batch), "vec_id", m)
      .join(broadcast(codebook), "sub")
      .withColumn("d", sqdist(col("svec"), col("c_vec")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
  }

  /** Mean PQ reconstruction error (quantization MSE) of `vecs` under
    * `codebook` — the DRIFT PROBE of index maintenance: the codebooks
    * were trained to minimize exactly this error on the training
    * distribution, so a rising error on recent appends is the direct
    * signal that the data has moved and ADC scores (hence recall) are
    * decaying. One broadcast join + map-side-combined argmin over the
    * probe batch — O(batch·m·ksub), never corpus work — ending in a
    * single scalar to the driver.
    */
  private[graft] def pqQuantError(vecs: DataFrame, codebook: DataFrame,
                                  m: Int = 8): Double = {
    def sqdist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, z) => acc + z)
    pqSubvecs(pqNormalize(vecs), "vec_id", m)
      .join(broadcast(codebook), "sub")
      .withColumn("d", sqdist(col("svec"), col("c_vec")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(col("d")).as("d"))
      .groupBy("vec_id").agg(sum("d").as("err"))
      .agg(avg("err")).head().getDouble(0)
  }

  private def statsDf(s: SparkSession, trainErr: Double): DataFrame = {
    import s.implicits._
    Seq(trainErr).toDF("train_err")
  }

  /** The index LIFECYCLE pass — what s07's append-only story was
    * missing: appends accrete small tagged dirs (scan tasks follow file
    * count) and encode against FROZEN codebooks (recall decays when the
    * distribution drifts). One maintenance call decides between the two
    * remedies:
    *
    *  1. probe drift: quantization error of `recentVecs` (the vectors
    *     appended since the last pass) vs the training-time error the
    *     lake's `stats` table records;
    *  2. ratio <= driftThreshold → the codebooks still fit; COMPACT the
    *     codes table (bin-pack the append dirs; atomic re-point) and
    *     vacuum superseded versions — pure layout maintenance;
    *  3. ratio >  driftThreshold → RE-ENCODE: retrain codebooks on the
    *     CURRENT corpus (`allVecs` — in production the corpus table the
    *     index serves), re-encode every vector, record the new training
    *     error, and publish (codebook, codes, stats) in ONE atomic
    *     commit — a query planned mid-rebuild reads the old consistent
    *     index, the next one the new; replayed append tags survive the
    *     re-commit (manifest tag lines), so exactly-once ingestion
    *     holds across rebuilds.
    *
    * Returns the action taken ("compacted" | "re-encoded"). AnnSpec
    * proves same-distribution appends compact, a drifted distribution
    * re-encodes, and the rebuilt index restores the recall the drifted
    * batch lost.
    */
  def maintainPqLake(lake: graft.sources.Snapshots, recentVecs: DataFrame,
                     allVecs: DataFrame, m: Int = 8, ksub: Int = 16,
                     iters: Int = 2, driftThreshold: Double = 1.5,
                     targetBytes: Long = 16L << 20): String = {
    val s = recentVecs.sparkSession
    val codebook = lake.read("codebook")
    val trainErr = lake.read("stats").head().getDouble(0)
    val recentErr = pqQuantError(recentVecs, codebook, m)
    if (recentErr / trainErr > driftThreshold) {
      val (cb, codes) = pqIndex(allVecs, m, ksub, iters)
      val newErr = pqQuantError(allVecs, cb, m)
      lake.commit(Map("codebook" -> cb, "codes" -> codes,
        "stats" -> statsDf(s, newErr)))
      "re-encoded"
    } else {
      lake.compact("codes", targetBytes = targetBytes)
      lake.vacuum(keepLast = 2)
      "compacted"
    }
  }

  /** The PQ index as a MAINTAINED Snapshots table (codebook + codes),
    * staged once per sf dir: this is what the index IS in production —
    * a transactional lake table that incremental batches append into,
    * with the same exactly-once tags, time travel, and compaction as
    * any other table.
    */
  private[graft] def pqLakeStaged(s: SparkSession, dir: String,
                           m: Int = 8, ksub: Int = 16, iters: Int = 2): graft.sources.Snapshots = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s.conf.get("spark.sql.warehouse.dir") + s"/pq_lake_${m}_$ksub$tag"
    val lake = new graft.sources.Snapshots(s, root)
    graft.StagedFixture.ensure(s, root, "G3", Seq(m, ksub, iters)) {
      val corpus = emb(s, dir)
      val (cb, codes) = pqIndex(corpus, m, ksub, iters)
      // training-time quantization error rides in the lake: it is the
      // baseline every later drift probe (maintainPqLake) compares to
      lake.commit(Map("codebook" -> cb, "codes" -> codes,
        "stats" -> statsDf(s, pqQuantError(corpus, cb, m))))
    }
    lake
  }

  /** C30 `s07_ann_index_append`: INCREMENTAL index maintenance — the
    * ANN twin of d06/d08's incremental-dedup story. A 100 TB embedding
    * corpus is indexed once and then APPENDED to: each arriving batch
    * is encoded against the existing immutable codebooks ([[pqEncode]])
    * and lands as an O(batch) tagged [[graft.sources.Snapshots.append]]
    * — not one existing code is rewritten, replays are no-ops, and a
    * query planned mid-append reads a consistent committed version.
    * The probe then runs the standard ADC + exact-re-rank over the
    * UPDATED index. The batch here re-sends the query vectors under
    * offset ids, so each query's new top-1 must be its appended exact
    * duplicate (cos 1.0) — searchability of the appended rows is what
    * AnnSpec gates, plus append O(batch) and replay idempotence.
    */
  def s07AnnIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val lake = pqLakeStaged(s, dir)
    val batch = emb(s, dir).where(col("vec_id") < NQueries)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val codebook = lake.read("codebook")
    lake.append("codes", pqEncode(batch, codebook), tag = Some("b1"))
    val eAug = emb(s, dir).select(col("vec_id"), col("embedding")).unionByName(batch)
    annPqOn(eAug, index = Some((codebook, lake.read("codes"))))
  }

  /** Per-query ADC table: lut[sub*ksub + code] = q_sub · centroid —
    * ksub·m tiny dot products per query, never corpus work. array_sort
    * on (sub, code, ip) structs orders lexicographically, so position
    * sub*ksub+code indexes the flattened table.
    */
  private def pqLut(e: DataFrame, codebook: DataFrame, nQueries: Int, m: Int): DataFrame =
    pqSubvecs(pqNormalize(e.where(col("vec_id") < nQueries))
        .withColumnRenamed("vec_id", "q_id"), "q_id", m)
      .join(broadcast(codebook), "sub")
      .withColumn("ip",
        aggregate(zip_with(col("svec"), col("c_vec"), (x, y) => x * y),
          lit(0.0d), (acc, z) => acc + z))
      .groupBy("q_id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code"), col("ip")))),
        x => x.getField("ip")).as("lut"))

  /** Shared PQ scoring tail over (q_id, vec_id, codes, lut) pairs: ADC
    * (m lookups per pair, codes only) → bounded-heap shortlist → exact
    * cosine re-rank joining the float vectors back for the shortlist
    * alone (broadcast of k'·queries rows over the corpus scan).
    */
  private def adcRerank(e: DataFrame, pairs: DataFrame, m: Int, ksub: Int,
                        shortlist: Int, nQueries: Int, k: Int): DataFrame = {
    val adc = pairs.withColumn("cos", expr(
        s"aggregate(sequence(0, ${m - 1}), 0D, (acc, i) -> acc + element_at(lut, i*$ksub + element_at(codes, i+1) + 1))"))
      .select("q_id", "vec_id", "cos")
    rerankExact(e, adc, shortlist, nQueries, k)
  }

  /** Shared tail of every codes-scan ANN path: bounded-heap shortlist
    * per query over the APPROXIMATE scores, then the exact cosine only
    * for shortlist rows (broadcast of shortlist·queries — the only
    * rows whose float vectors are ever read after quantization).
    */
  private def rerankExact(e: DataFrame, approxScored: DataFrame,
                          shortlist: Int, nQueries: Int, k: Int): DataFrame = {
    import graft.plans.TopK
    val short = TopK.perGroup(approxScored, Seq("q_id"),
        Seq(("cos", false), ("vec_id", true)), shortlist)
      .select("q_id", "vec_id")
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    topKPerQuery(
      e.select(col("vec_id"), col("embedding"))
        .join(broadcast(short), "vec_id")
        .join(broadcast(q), "q_id")
        .withColumn("cos", cosine_sim(col("embedding"), col("q_vec"))),
      k)
  }

  /** Trains the SQ8 index: GLOBAL [lo, hi] over every normalized
    * component (FAISS's QT_8bit_uniform contract — uniform bounds keep
    * the train step one tiny aggregate and the codes comparable across
    * dimensions), each vector stored as 64 BYTES (`array<tinyint>`,
    * code = round((x-lo)/step) - 128). Returns (codes(vec_id, codes,
    * lo, step)) — lo/step ride as constant columns (RLE-compressed to
    * nothing at rest). Exposed to AnnSpec for the quantization
    * invariants.
    */
  private[graft] def sq8Index(e: DataFrame): DataFrame = {
    val normed = pqNormalize(e)
    val b = normed.agg(min(array_min(col("vec"))).cast("double").as("lo"),
      max(array_max(col("vec"))).cast("double").as("hi")).head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val step = math.max((hi - lo) / 255.0, Double.MinPositiveValue)
    normed.select(col("vec_id"),
      transform(col("vec"), x =>
        (round((x.cast("double") - lit(lo)) / lit(step)).cast("int") - 128)
          .cast("tinyint")).as("codes"),
      lit(lo).as("lo"), lit(step).as("step"))
  }

  /** C66 s13: SCALAR-QUANTIZATION ANN (SQ8) — the second memory-scale
    * path, the accuracy/compression point BETWEEN exact floats and
    * s05's PQ: 4× compression (one byte per component vs one float),
    * near-exact fidelity (quantization error ≤ step/2 per component).
    * The scan touches CODES ONLY: dot(q, x) ≈ lo·Σq_d + step·Σ
    * q_d·(c_d+128) — one per-query bias plus a byte-dot, no corpus
    * float is read until the exact re-rank of the shortlist (shared
    * [[rerankExact]] tail with PQ). FAISS ScalarQuantizer
    * QT_8bit_uniform, public design. Same output shape as s01;
    * AnnSpec gates recall (higher floor than PQ — SQ8 is the
    * high-fidelity point) and the quantization invariants.
    */
  def annSq8On(e: DataFrame, shortlist: Int = 100, nQueries: Int = NQueries,
               k: Int = K, index: Option[DataFrame] = None): DataFrame = {
    val codes = index.getOrElse(sq8Index(e))
    val qs = pqNormalize(e.where(col("vec_id") < nQueries))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec_n"),
        aggregate(col("vec"), lit(0.0d), (a, x) => a + x.cast("double")).as("q_sum"))
    val pairs = codes.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        col("lo") * col("q_sum") + col("step") * expr(
          "aggregate(zip_with(q_vec_n, codes, (q, c) -> q * (CAST(c AS DOUBLE) + 128D)), 0D, (a, x) -> a + x)"))
      .select("q_id", "vec_id", "cos")
    rerankExact(e, pairs, shortlist, nQueries, k)
  }

  def s13AnnSq8(s: SparkSession, dir: String): DataFrame =
    annSq8On(emb(s, dir), index = Some(sq8IndexStaged(s, dir)))

  /** The SQ8 index staged once per sf dir (the staged-fixture pattern
    * of the PQ/IVF indexes — in production the byte table IS the
    * maintained index).
    */
  private def sq8IndexStaged(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s.conf.get("spark.sql.warehouse.dir") + s"/sq8_index$tag"
    graft.StagedFixture.ensure(s, path, "G1") {
      sq8Index(emb(s, dir)).write.mode("overwrite").parquet(s"$path/codes")
    }
    s.read.parquet(s"$path/codes")
  }

  /** L2-normalized float vectors (inner product == cosine thereafter). */
  private def pqNormalize(e: DataFrame): DataFrame = {
    val l2 = sqrt(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x))
    e.select(col("vec_id"),
      transform(col("embedding"), x => (x / l2).cast("float")).as("vec"))
  }

  /** (id, sub, svec): one row per subvector. */
  private def pqSubvecs(normed: DataFrame, idCol: String, m: Int): DataFrame = {
    val sub = 64 / m
    normed.select(col(idCol),
        posexplode(expr(s"transform(sequence(0, ${m - 1}), s -> slice(vec, s*$sub+1, $sub))")))
      .toDF(idCol, "sub", "svec")
  }

  /** Trains the per-subspace codebooks and encodes the corpus. Returns
    * (codebook(sub, code, c_vec), codes(vec_id, codes[m])) — the PQ
    * index. Exposed to AnnSpec for the compression invariants.
    */
  private[graft] def pqIndex(e: DataFrame, m: Int = 8, ksub: Int = 16,
                             iters: Int = 2): (DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val sub = 64 / m
    val corpusSub = pqSubvecs(pqNormalize(e), "vec_id", m)
      .persist(StorageLevel.MEMORY_AND_DISK)

    def sqdist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, z) => acc + z)

    // nearest-codebook-entry per (vector, subspace): a partial-aggregable
    // min_by, NOT a per-(vec,sub) window sort — at 100 TB the argmin must
    // map-side combine, never ride corpus×ksub rows through a window.
    def assign(cb: DataFrame): DataFrame =
      corpusSub.join(broadcast(cb), "sub")
        .withColumn("d", sqdist(col("svec"), col("c_vec")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(struct(col("code"), col("svec")), struct(col("d"), col("code"))).as("a"))
        .select(col("vec_id"), col("sub"), col("a.code").as("code"), col("a.svec").as("svec"))

    // codebook init: the same hash-draw seed rule as IVF, one TakeOrdered
    // scan; each seed vector's m subvectors seed code c in all m books.
    var codebook = pqSubvecs(
        pqNormalize(e).orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(ksub)
          // bounded single-partition window: ≤ksub seed rows
          .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int").as("code"),
            col("vec")),
        "code", m)
      .select(col("sub"), col("code"), transform(col("svec"), _.cast("double")).as("c_vec"))
    for (_ <- 0 until iters) {
      val updated = assign(codebook)
        .groupBy("sub", "code")
        .agg(graft.functions.VecMeanAgg.vec_mean(col("svec"), sub).as("c_vec"))
      // a centroid that lost every point keeps its old vector (never
      // chosen by argmin, harmless) so (sub, code) stays DENSE — the
      // flattened ADC lookup table indexes by sub*ksub+code.
      codebook = updated.union(
        codebook.join(updated.select("sub", "code"), Seq("sub", "code"), "left_anti"))
    }
    val cbP = codebook.persist(StorageLevel.MEMORY_AND_DISK)

    // the PQ index: (vec_id, codes[m]) — the 8-byte scan set.
    val codes = assign(cbP)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
    (cbP, codes)
  }

  /** C7c: per-label centroids via the custom vec_mean aggregate
    * (functions/VecMeanAgg.scala) — the k-means update step that
    * refines s03's coarse quantizer. One map-side-combined shuffle
    * carrying a single (dim+1)-double buffer per (label, task). Output
    * projects scalar probes of the centroid (first elements + L2 norm)
    * so the oracle compare stays on flat columns.
    */
  def s04CentroidAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VecMeanAgg.vec_mean
    emb(s, dir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"), vec_mean(col("embedding"), 64).as("centroid"))
      .select(col("label"), col("n"),
        round(element_at(col("centroid"), 1), 6).as("c1"),
        round(element_at(col("centroid"), 2), 6).as("c2"),
        round(element_at(col("centroid"), 3), 6).as("c3"),
        round(sqrt(aggregate(col("centroid"), lit(0.0), (a, x) => a + x * x)), 6)
          .as("centroid_norm"))
      .orderBy("label")
  }

  /** k-means refinement of the IVF coarse quantizer — Lloyd iterations
    * composed from the engine's own pieces: broadcast-argmin assignment
    * (the s03 partition step) + the vec_mean custom aggregate (the s04
    * update step). Each iteration is one scan + one tiny shuffle
    * (nlist buffers per task); centroids live in a broadcast, never on
    * the driver beyond the nlist×dim collect. Returns (iteration,
    * mean cosine distance to assigned centroid) so callers see the
    * monotone objective — KmeansSpec asserts it.
    *
    * This is SPHERICAL k-means: embeddings are L2-normalized up front,
    * so the vec_mean centroid update (mean of unit vectors = the mean
    * direction) is the true argmax of Σ cos(x, c) for a fixed
    * assignment — which is what makes the cosine objective provably
    * non-increasing per Lloyd step. A plain mean of RAW vectors is the
    * argmin only for squared-Euclidean; with it the cosine objective
    * can legitimately rise. Normalization changes no assignment
    * (cosine is scale-invariant) and costs one scan-side projection.
    */
  def kmeansRefine(s: SparkSession, dir: String,
                   nlist: Int = 16, iters: Int = 3): Seq[(Int, Double)] = {
    import graft.functions.VecMeanAgg.vec_mean
    val l2 = sqrt(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x))
    val e = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => (x / l2).cast("float")).as("embedding"))
    var cents = hashDrawCentroids(e, nlist)
      .select(col("cid"), transform(col("c_vec"), _.cast("double")).as("c_vec"))

    val history = scala.collection.mutable.ListBuffer.empty[(Int, Double)]
    for (it <- 0 until iters) {
      val w = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cid"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("c_cos",
          cosine_sim(col("embedding"), transform(col("c_vec"), _.cast("float"))))
        .withColumn("r", row_number().over(w))
        .where(col("r") === 1)
      val obj = assigned.agg(avg(lit(1.0) - col("c_cos"))).head().getDouble(0)
      history += ((it, obj))
      cents = assigned.groupBy("cid")
        .agg(vec_mean(col("embedding"), 64).as("c_vec"))
        .select(col("cid"), col("c_vec"))
    }
    history.toSeq
  }

  private[pipeline] case class MmrCand(q_id: Long, vec_id: Long, rel: Double,
                                       embedding: Array[Float])
  private[pipeline] case class MmrPick(q_id: Long, rank: Int, vec_id: Long,
                                       rel: Double)

  /** C58 `s11_ann_mmr`: MMR diverse re-ranking (Carbonell & Goldstein's
    * maximal marginal relevance, public) — the selection every
    * retrieval-augmented curation step runs AFTER top-k: pure top-k
    * returns near-duplicates of one mode, MMR greedily picks
    * argmax(λ·rel − (1−λ)·max-sim-to-selected), trading relevance for
    * coverage. Scale shape: relevance candidates come from the standard
    * bounded-heap top-`poolSize` pass (s01's machinery — corpus never
    * shuffled), and the inherently SEQUENTIAL greedy runs per query in
    * a flatMapGroups kernel over its ≤poolSize-row pool — O(k·pool·dim)
    * per query, bounded by construction, the documented kernel
    * exception (a greedy step depends on all previous picks; no
    * declarative form exists). Cross-engine margins audited: greedy
    * argmax gap ≥3.8e-4, pool 20/21 boundary ≥1.3e-4, round-6 rel
    * boundary ≥2.7e-9 — all far above double drift.
    */
  def s11AnnMmr(s: SparkSession, dir: String, lam: Double = 0.7,
                k: Int = 8, poolSize: Int = 20): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = e.where(col("vec_id") >= NQueries)
      .crossJoin(broadcast(q))
      .withColumn("rel", cosine_sim(col("embedding"), col("q_vec")))
      .select(col("q_id"), col("vec_id"), col("rel"), col("embedding"))
    val pool = graft.plans.TopK.perGroup(scored, Seq("q_id"),
      Seq(("rel", false), ("vec_id", true)), poolSize)
    pool.as[MmrCand].groupByKey(_.q_id)
      .flatMapGroups { (qid, it) =>
        val cands = scala.collection.mutable.ArrayBuffer(it.toSeq: _*)
        val sel = scala.collection.mutable.ArrayBuffer.empty[MmrCand]
        val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        var r = 1
        while (r <= k && cands.nonEmpty) {
          val best = cands.minBy { c =>
            val pen =
              if (sel.isEmpty) 0.0
              else sel.map(sc => graft.functions.Kernels.cosine(c.embedding, sc.embedding)).max
            (-(lam * c.rel - (1 - lam) * pen), c.vec_id)
          }
          cands -= best
          sel += best
          out += MmrPick(qid, r, best.vec_id, best.rel)
          r += 1
        }
        out.iterator
      }
      .toDF()
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"),
        round(col("rel"), 6).as("rel_cos"))
      .orderBy("q_id", "rank")
  }

  /** C69 `s14_ann_sql`: SQL-ADDRESSABLE vector search — after two
    * rounds of "everything as text" the ANN surface was still
    * Scala-only; this closes it through Spark 4's ProcedureCatalog:
    * `CALL graft.system.ann_search(lake, table, qvec, k)` runs the
    * same distributed scored-scan + TakeOrdered top-k over a LAKE
    * table (stats-planned read, codegen cosine, per-partition heaps,
    * k rows to the driver — a CALL's natural result-set shape). The
    * key loads the embeddings corpus into the lake AS TEXT, issues one
    * CALL per query vector, and the DuckDB oracle pins the s01 closed
    * form (self included at rank 1 with cos 1.0 — the corpus contains
    * the query doc, the production semantic).
    */
  def s14AnnSql(s: SparkSession, dir: String, nQueries: Int = 4, k: Int = K): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    graft.sources.Catalog.register(s, dir)
    val ns = "db_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    s.sql(s"CREATE NAMESPACE graft.$ns")
    s.sql(s"CREATE TABLE graft.$ns.emb_t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    s.sql(s"INSERT INTO graft.$ns.emb_t SELECT vec_id, embedding FROM embeddings")
    // one CALL per query vector; Float.toString round-trips, and the
    // procedure casts the parsed literal back to the column's FLOAT
    // element type, so the CALL scores the EXACT original vector
    val qs = s.sql(s"SELECT vec_id, embedding FROM embeddings WHERE vec_id < $nQueries ORDER BY vec_id")
      .collect()
    qs.map { r =>
      val qv = r.getSeq[Float](1).mkString(",")
      s.sql(s"CALL graft.system.ann_search('$ns', 'emb_t', '$qv', $k)")
        .withColumn("q_id", lit(r.getLong(0)))
    }.reduce(_ unionByName _)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** C71 `s15_ann_sql_ivf`: INDEX-BACKED vector search as text — the
    * half s14 left Scala-only. `CALL graft.system.ann_index_ivf`
    * trains the coarse quantizer (k-means|| + Lloyd) and publishes the
    * index as lake tables — `emb_ivf_cents` (cid, c_vec) and `emb_ivf`
    * (cid, vec_id, embedding) CLUSTERED BY cid, so every coarse list
    * is a stat-tight file run. `CALL graft.system.ann_search_ivf`
    * selects the nprobe nearest lists driver-side (nlist rows) and
    * runs ONE stats-pruned distributed scan over exactly those lists.
    * Approximate by construction → rows-only; AnnSpec pins full-probe
    * == exact, in-list membership at nprobe=1, and the rank-1 self.
    */
  def s15AnnSqlIvf(s: SparkSession, dir: String, nQueries: Int = 4, k: Int = K): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    graft.sources.Catalog.register(s, dir)
    val ns = "db_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    s.sql(s"CREATE NAMESPACE graft.$ns")
    s.sql(s"CREATE TABLE graft.$ns.emb_t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    s.sql(s"INSERT INTO graft.$ns.emb_t SELECT vec_id, embedding FROM embeddings")
    s.sql(s"CALL graft.system.ann_index_ivf('$ns', 'emb_t', 'emb_ivf', 0)")
    val qs = s.sql(s"SELECT vec_id, embedding FROM embeddings WHERE vec_id < $nQueries ORDER BY vec_id")
      .collect()
    qs.map { r =>
      val qv = r.getSeq[Float](1).mkString(",")
      s.sql(s"CALL graft.system.ann_search_ivf('$ns', 'emb_ivf', '$qv', $k, 4)")
        .withColumn("q_id", lit(r.getLong(0)))
    }.reduce(_ unionByName _)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** `s15_ivf_build`: the IVF index BUILD alone (CREATE + INSERT +
    * k-means‖/Lloyd train + two-table atomic publish) — split from
    * s15_ann_sql_ivf so the bench tracks build cost round-over-round
    * without probe noise. Returns (nlist, vectors), both closed forms
    * of the corpus size, so the key is DuckDB-oracled even though the
    * trained centroids themselves are approximate state.
    */
  def s15IvfBuild(s: SparkSession, dir: String): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    graft.sources.Catalog.register(s, dir)
    val ns = "db_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    s.sql(s"CREATE NAMESPACE graft.$ns")
    s.sql(s"CREATE TABLE graft.$ns.emb_t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    s.sql(s"INSERT INTO graft.$ns.emb_t SELECT vec_id, embedding FROM embeddings")
    s.sql(s"CALL graft.system.ann_index_ivf('$ns', 'emb_t', 'emb_ivf', 0)")
      .select(col("nlist"), col("vectors"))
  }

  /** `s15_ivf_probe`: the PROBE side isolated — the index builds ONCE
    * into a SHARED deterministic namespace (the bench's warmup pass
    * pays it; timed runs find the tables standing and measure pure
    * probe latency: driver-side nprobe selection + ONE stats-pruned
    * scan of the selected list file-runs per query). A corpus-count
    * mismatch (regenerated testdata under a stale warehouse) rebuilds.
    * 16 query vectors so the probe signal dominates any residual
    * bookkeeping. Approximate by construction → rows-only; AnnSpec
    * pins the IVF paths' correctness and recall.
    */
  def s15IvfProbe(s: SparkSession, dir: String, nQueries: Int = 16, k: Int = K): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    graft.sources.Catalog.register(s, dir)
    val ns = "db_ivfshared"
    val sn = new graft.sources.Snapshots(s, s"$root/$ns")
    val corpus = s.table("embeddings")
    val standing = sn.currentVersion.isDefined &&
      sn.tableNames().contains("emb_ivf") && sn.tableNames().contains("emb_t") &&
      sn.read("emb_t").count() == corpus.count()
    if (!standing) {
      if (sn.currentVersion.isDefined)
        Seq("emb_ivf", "emb_ivf_cents", "emb_t").foreach(t =>
          if (sn.tableNames().contains(t)) sn.dropTable(t))
      else s.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      if (!sn.currentVersion.exists(v => sn.tableNames(Some(v)).contains("emb_t")))
        s.sql(s"CREATE TABLE graft.$ns.emb_t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
      s.sql(s"INSERT INTO graft.$ns.emb_t SELECT vec_id, embedding FROM embeddings")
      s.sql(s"CALL graft.system.ann_index_ivf('$ns', 'emb_t', 'emb_ivf', 0)")
    }
    val qs = s.sql(s"SELECT vec_id, embedding FROM embeddings WHERE vec_id < $nQueries ORDER BY vec_id")
      .collect()
    qs.map { r =>
      val qv = r.getSeq[Float](1).mkString(",")
      s.sql(s"CALL graft.system.ann_search_ivf('$ns', 'emb_ivf', '$qv', $k, 4)")
        .withColumn("q_id", lit(r.getLong(0)))
    }.reduce(_ unionByName _)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** `s16_ann_recall`: the RECALL GATE — every approximate path's
    * recall@10 vs the s01 exact oracle, measured on the REAL corpus at
    * the keys' default knobs (IVF nprobe=4-of-adaptive, PQ m=8/ksub=16
    * ADC+rerank, SQ8 byte-dot shortlist). A quantizer regression that
    * halves recall now fails a NAMED test (AnnSpec pins per-method
    * floors from measured values) and shows in the driver's rows
    * instead of passing silently behind full-probe==exact pins. The
    * recall VALUE is data-dependent → rows-only key.
    */
  def s16AnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def sets(df: DataFrame): DataFrame = df.select("q_id", "neighbor_id")
    val exact = sets(s01AnnBruteforce(s, dir)).persist()
    exact.count()
    def recallOf(method: String, df: DataFrame): DataFrame = {
      val hits = sets(df).join(exact, Seq("q_id", "neighbor_id")).count()
      Seq((method, hits.toDouble / (NQueries.toDouble * K)))
        .toDF("method", "recall_at_10")
    }
    try recallOf("ivf_nprobe4", s03AnnIvf(s, dir))
      .union(recallOf("pq_m8", s05AnnPq(s, dir)))
      .union(recallOf("sq8", s13AnnSq8(s, dir)))
      .orderBy("method")
    finally exact.unpersist()
  }

  /** C73 `s17_ann_join`: BATCHED vector search as text — s14/s15
    * issue one CALL per query VECTOR (a literal in the statement); the
    * multi-query production shape ("embed this batch, find neighbors
    * for all of it") needs the query set to be a TABLE.
    * `CALL graft.system.ann_join(lake, corpus, queries, k, out)` runs
    * ONE distributed job — queries broadcast in hash chunks across the
    * corpus scan, codegen cosine, bounded-heap top-k per query — and
    * publishes the (q_id, rank, neighbor_id, cos_sim) result AS a lake
    * table (k·|queries| rows never ride the driver), returning only a
    * summary row. The key stages corpus + queries as text, CALLs once,
    * and reads the result back through the catalog; the DuckDB oracle
    * is the exact closed form (self included at rank 1 — the corpus
    * contains the query docs).
    */
  def s17AnnJoin(s: SparkSession, dir: String, nQueries: Int = 4, k: Int = K): DataFrame = {
    val root = s.conf.get("spark.sql.warehouse.dir") + "/c21_catalog"
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    graft.sources.Catalog.register(s, dir)
    val ns = "db_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    s.sql(s"CREATE NAMESPACE graft.$ns")
    s.sql(s"CREATE TABLE graft.$ns.emb_t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    s.sql(s"INSERT INTO graft.$ns.emb_t SELECT vec_id, embedding FROM embeddings")
    s.sql(s"CREATE TABLE graft.$ns.q_t (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    s.sql(s"INSERT INTO graft.$ns.q_t SELECT vec_id, embedding FROM embeddings WHERE vec_id < $nQueries")
    s.sql(s"CALL graft.system.ann_join('$ns', 'emb_t', 'q_t', $k, 'knn_out')")
    s.sql(s"SELECT q_id, rank, neighbor_id, cos_sim FROM graft.$ns.knn_out ORDER BY q_id, rank")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s17_ann_join" -> ((s, dir) => s17AnnJoin(s, dir)),
    "s16_ann_recall" -> s16AnnRecall _,
    "s14_ann_sql" -> ((s, dir) => s14AnnSql(s, dir)),
    "s15_ann_sql_ivf" -> ((s, dir) => s15AnnSqlIvf(s, dir)),
    "s15_ivf_build" -> s15IvfBuild _,
    "s15_ivf_probe" -> ((s, dir) => s15IvfProbe(s, dir)),
    "s11_ann_mmr" -> ((s, dir) => s11AnnMmr(s, dir)),
    "s01_ann_bruteforce" -> s01AnnBruteforce _,
    "s02_ann_lsh" -> ((s, dir) => s02AnnLsh(s, dir)),
    "s03_ann_ivf" -> ((s, dir) => s03AnnIvf(s, dir)),
    "s04_centroid_agg" -> s04CentroidAgg _,
    "s05_ann_pq" -> s05AnnPq _,
    "s06_ann_ivfpq" -> s06AnnIvfPq _,
    "s07_ann_index_append" -> s07AnnIndexAppend _,
    "s08_ann_filtered" -> ((s, dir) => s08AnnFiltered(s, dir)),
    "s09_hybrid_rrf" -> ((s, dir) => s09HybridRrf(s, dir)),
    "s10_ann_range" -> ((s, dir) => s10AnnRange(s, dir)),
    "s12_ann_filtered_ivf" -> ((s, dir) => s12AnnFilteredIvf(s, dir)),
    "s13_ann_sq8" -> s13AnnSq8 _)

  /** The MMR greedy has a sequential data dependence, so the oracle
    * UNROLLS it: k explicit pick layers, each re-scoring the remaining
    * pool against everything selected so far (pairwise sims
    * precomputed once per pool). Generated programmatically so layer
    * arithmetic cannot drift from the kernel's.
    */
  private def mmrOracleSql(lam: Double, k: Int, pool: Int): String = {
    // every layer is AS MATERIALIZED: without it DuckDB inlines the
    // CTE chain and the union-of-previous-picks re-evaluates its whole
    // ancestry per reference — exponential in k (measured: >3 min
    // inlined vs 0.3 s materialized)
    val sb = new StringBuilder
    sb ++=
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < $NQueries
         |), c0 AS MATERIALIZED (
         |  SELECT q_id, vec_id, rel, ev, rn FROM (
         |    SELECT q.q_id, e.vec_id,
         |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS rel,
         |      CAST(e.embedding AS DOUBLE[]) AS ev,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
         |                 e.vec_id) AS rn
         |    FROM embeddings e CROSS JOIN q WHERE e.vec_id >= $NQueries)
         |  WHERE rn <= $pool
         |), pp AS MATERIALIZED (
         |  SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
         |    list_cosine_similarity(a.ev, b.ev) AS sim
         |  FROM c0 a JOIN c0 b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
         |), p1 AS MATERIALIZED (
         |  SELECT q_id, vec_id, rel, 1 AS rank FROM c0 WHERE rn = 1
         |)""".stripMargin
    for (n <- 2 to k) {
      val sel = (1 until n).map(i => s"SELECT q_id, vec_id FROM p$i")
        .mkString(" UNION ALL ")
      sb ++=
        s""", s$n AS MATERIALIZED ($sel), sc$n AS MATERIALIZED (
           |  SELECT c.q_id, c.vec_id, c.rel,
           |    $lam * c.rel - (1 - $lam) * coalesce(mx.m, 0) AS score
           |  FROM c0 c
           |  LEFT JOIN (SELECT pp.q_id, pp.va, max(pp.sim) AS m
           |             FROM pp JOIN s$n ON pp.q_id = s$n.q_id AND pp.vb = s$n.vec_id
           |             GROUP BY 1, 2) mx
           |    ON mx.q_id = c.q_id AND mx.va = c.vec_id
           |  WHERE NOT EXISTS (SELECT 1 FROM s$n x
           |                    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
           |), p$n AS MATERIALIZED (
           |  SELECT q_id, vec_id, rel, $n AS rank FROM (
           |    SELECT *, row_number() OVER (PARTITION BY q_id
           |                                 ORDER BY score DESC, vec_id) AS rn
           |    FROM sc$n) WHERE rn = 1
           |)""".stripMargin
    }
    val all = (1 to k).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")
    sb ++=
      s"""
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id,
         |  round(rel, 6) AS rel_cos
         |FROM ($all) ORDER BY q_id, rank""".stripMargin
    sb.toString
  }

  /** s02 is rows-only: its result depends on the LSH bucketing, which is
    * not SQL-expressible; AnnSpec holds its recall gate.
    */
  val oracles: Map[String, String] = Map(
    "s11_ann_mmr" -> mmrOracleSql(0.7, 8, 20),
    // nlist = max(16, min(256, n/64)) — Ann.adaptiveNlist's closed form
    "s15_ivf_build" ->
      """SELECT CAST(GREATEST(16, LEAST(256, count(*) // 64)) AS INT) AS nlist,
        |  count(*) AS vectors
        |FROM embeddings""".stripMargin,
    // same closed form as s14 (self included at rank 1): the staged
    // query table IS embeddings WHERE vec_id < 4
    "s17_ann_join" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 4
        |), scored AS (
        |  SELECT q_id, vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_vec AS DOUBLE[])) AS cos
        |  FROM embeddings, q
        |), ranked AS (
        |  SELECT q_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank,
        |    neighbor_id, cos
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        |  round(cos, 6) AS cos_sim
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "s14_ann_sql" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 4
        |), scored AS (
        |  SELECT q_id, vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_vec AS DOUBLE[])) AS cos
        |  FROM embeddings, q
        |), ranked AS (
        |  SELECT q_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank,
        |    neighbor_id, cos
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        |  round(cos, 6) AS cos_sim
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "s10_ann_range" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
        |)
        |SELECT q_id, vec_id AS neighbor_id,
        |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_vec AS DOUBLE[])), 6) AS cos_sim
        |FROM embeddings, q
        |WHERE vec_id <> q_id
        |  AND list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_vec AS DOUBLE[])) >= 0.3
        |ORDER BY q_id, neighbor_id""".stripMargin,
    "s09_hybrid_rrf" ->
      """WITH corpus AS (
        |  SELECT d.doc_id, d.text, e.embedding
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |  WHERE d.doc_id <> 0
        |), toks AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS dl,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM corpus
        |), scalars AS (
        |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM toks
        |), tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM toks)
        |  WHERE term IN ('spark', 'merge', 'vector')
        |  GROUP BY doc_id, dl, term
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS dfr FROM tf GROUP BY term
        |), lex AS (
        |  SELECT tf.doc_id,
        |    sum(ln(1.0 + (s.n_docs - d.dfr + 0.5) / (d.dfr + 0.5)) * tf.tf * (1.2 + 1.0)
        |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS bm25
        |  FROM tf JOIN dfreq d USING (term) CROSS JOIN scalars s
        |  GROUP BY tf.doc_id
        |), lex_top AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
        |  FROM lex QUALIFY rank_lex <= 100
        |), qv AS (
        |  SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0
        |), vec AS (
        |  SELECT c.doc_id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.q_vec AS DOUBLE[])) AS cos
        |  FROM corpus c CROSS JOIN qv q
        |), vec_top AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_vec
        |  FROM vec QUALIFY rank_vec <= 100
        |)
        |SELECT doc_id,
        |  CAST(coalesce(l.rank_lex, -1) AS BIGINT) AS rank_lex,
        |  CAST(coalesce(v.rank_vec, -1) AS BIGINT) AS rank_vec,
        |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + l.rank_lex), 0)
        |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + v.rank_vec), 0), 6) AS rrf_score
        |FROM lex_top l FULL OUTER JOIN vec_top v USING (doc_id)
        |ORDER BY rrf_score DESC, doc_id
        |LIMIT 20""".stripMargin,
    "s08_ann_filtered" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q_id, vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_vec AS DOUBLE[])) AS cos
        |  FROM embeddings, q WHERE vec_id <> q_id AND label = 2
        |), ranked AS (
        |  SELECT q_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank,
        |    neighbor_id, cos
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        |  round(cos, 6) AS cos_sim
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "s01_ann_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q_id, vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_vec AS DOUBLE[])) AS cos
        |  FROM embeddings, q WHERE vec_id <> q_id
        |), ranked AS (
        |  SELECT q_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank,
        |    neighbor_id, cos
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        |  round(cos, 6) AS cos_sim
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "s04_centroid_agg" ->
      """WITH m AS (
        |  SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS mi
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
        |  GROUP BY 1, 2
        |), agg AS (
        |  SELECT label,
        |    round(max(CASE WHEN i = 1 THEN mi END), 6) AS c1,
        |    round(max(CASE WHEN i = 2 THEN mi END), 6) AS c2,
        |    round(max(CASE WHEN i = 3 THEN mi END), 6) AS c3,
        |    round(sqrt(sum(mi * mi)), 6) AS centroid_norm
        |  FROM m GROUP BY 1
        |), cnt AS (
        |  SELECT label, count(*) AS n FROM embeddings GROUP BY 1
        |)
        |SELECT CAST(a.label AS BIGINT) AS label, cnt.n, c1, c2, c3, centroid_norm
        |FROM agg a JOIN cnt ON a.label = cnt.label
        |ORDER BY 1""".stripMargin)
}
