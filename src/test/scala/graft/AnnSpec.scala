package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Ann

/** Recall gate for the LSH ANN path vs the exact brute-force baseline.
  *
  * The sf0.001 embeddings are *uniform random* vectors — the hardest
  * case for angular LSH (neighbors sit at cos≈0.5, barely above the
  * bulk) — so the bar here is deliberately modest; on clustered real
  * embeddings the same (8 tables × 6 bits) parameters recall far
  * higher. What the test pins down is that bucketing works at all and
  * never hallucinates: every reported neighbor must really be in the
  * candidate's bucket AND scored with the exact cosine.
  */
class AnnSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sfTest

  test("s02 LSH recall@10 vs exact s01, and no fabricated scores") {
    val exact = Ann.s01AnnBruteforce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val approx = Ann.s02AnnLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))

    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approxSets = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exactSets.map { case (q, truth) =>
      (approxSets.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(s"mean recall@10 on uniform-random vectors: $meanRecall")
    assert(meanRecall >= 0.60, s"mean recall@10 $meanRecall below floor (multi-probe)")

    // scores must be the exact cosine: any (q, neighbor) also present in
    // the exact result must carry an identical rounded score.
    val exactScore = exact.map(t => (t._1, t._2) -> t._3).toMap
    approx.foreach { case (q, n, s) =>
      exactScore.get((q, n)).foreach(es => assert(es == s, s"score mismatch for ($q,$n)"))
    }
  }

  test("s03 IVF probes a corpus fraction yet keeps useful recall") {
    val exact = Ann.s01AnnBruteforce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val ivf = Ann.s03AnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      (ivf.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(s"IVF (nprobe 4/16) mean recall@10 on uniform-random vectors: $meanRecall")
    // nprobe/nlist = 25% of the corpus scored; random vectors make the
    // centroid structure weak, so the floor is the scored fraction.
    assert(meanRecall >= 0.25, s"mean recall $meanRecall below scored fraction")
  }

  /** Clustered corpus — the regime ANN actually runs in (real
    * embeddings cluster; uniform-random is the adversarial floor case).
    * 16 unit centers in 64d; cluster membership is random (seeded) so no
    * arithmetic alignment exists between ids and clusters; noise is
    * scaled by 1/sqrt(dim) so the noise VECTOR norm is ~0.35 of the
    * unit center (a raw 64-dim gaussian has norm ~8 and would drown the
    * cluster structure) → cluster-mate cosine ~0.89.
    */
  private def clusteredVecs(centersSeed: Int, n: Int, idsFrom: Long = 0L): org.apache.spark.sql.DataFrame = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(centersSeed)
    def normalize(v: Array[Float]): Array[Float] = {
      val nn = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / nn)
    }
    val centers = Array.fill(16)(normalize(Array.fill(64)(rnd.nextGaussian().toFloat)))
    val noiseScale = 0.35f / math.sqrt(64).toFloat
    val vecs = (0 until n).map { i =>
      val c = centers(rnd.nextInt(16))
      (idsFrom + i, normalize(c.zip(Array.fill(64)(rnd.nextGaussian().toFloat))
        .map { case (ci, ni) => ci + noiseScale * ni }))
    }
    vecs.toDF("vec_id", "embedding")
      .withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
  }

  private lazy val clusteredCorpus: org.apache.spark.sql.DataFrame = clusteredVecs(42, 960)

  private val clusteredN = 960

  private def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view
    .mapValues(_.map(_._2).toSet).toMap

  test("multi-probe LSH on a clustered corpus: recall@10 >= 0.8 at a fraction of the scoring cost") {
    val e = clusteredCorpus
    // Bucket width is the per-corpus tuning knob: bits ≈ log2(n /
    // wanted-bucket-size). 6-bit buckets (the uniform-corpus default)
    // would lump whole clusters together — fine for recall, no pruning;
    // 10-bit buckets cut the candidate set an order of magnitude while
    // multi-probe keeps near-miss cluster-mates.
    val (tables, bits) = (8, 10)
    val exact = sets(Ann.annExactOn(e))
    val lsh = sets(Ann.annLshOn(e, tables = tables, bits = bits))
    val recalls = exact.map { case (q, truth) =>
      (lsh.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    val scored = Ann.annLshCandidates(e, tables = tables, bits = bits).count()
    val fraction = scored.toDouble / (Ann.NQueries.toLong * clusteredN)
    info(f"clustered corpus (8 tables x 10 bits, multi-probe): recall@10 $meanRecall%.3f, " +
      f"scored fraction $fraction%.3f ($scored candidates vs ${Ann.NQueries * clusteredN} brute-force pairs)")
    assert(meanRecall >= 0.8, f"clustered recall@10 $meanRecall%.3f < 0.8")
    assert(fraction < 0.25, f"scored fraction $fraction%.3f gives no real pruning")
  }

  test("IVF on a clustered corpus: recall@10 >= 0.8 scoring ~nprobe/nlist of the corpus") {
    val e = clusteredCorpus
    val (nlist, nprobe) = (16, 4)
    val exact = sets(Ann.annExactOn(e))
    val ivf = sets(Ann.annIvfOn(e, nlist = nlist, nprobe = nprobe))
    val recalls = exact.map { case (q, truth) =>
      (ivf.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"clustered corpus IVF (nprobe $nprobe/$nlist): recall@10 $meanRecall%.3f " +
      f"(the uniform-corpus baseline sits near the scored fraction — " +
      f"centroid structure is what IVF exploits)")
    assert(meanRecall >= 0.8, f"clustered IVF recall@10 $meanRecall%.3f < 0.8")
  }

  test("trained IVF (k-means|| + Lloyd): recall holds at 3x the list count, scored fraction stays bounded") {
    val e = clusteredCorpus
    // the scale regime the adaptive sizing produces on a bigger corpus:
    // 3x the nlist the corpus's 16 true modes would suggest — the
    // UNTRAINED hash draw fragments modes across arbitrary seed
    // vectors as nlist grows; training re-aligns lists with geometry
    val (nlist, nprobe) = (48, 12) // nominal scored fraction = 25%
    val cents = Ann.trainCentroids(e, nlist, lloydIters = 2)
    assert(cents.count() == nlist.toLong, "trained quantizer must stay dense")
    val exact = sets(Ann.annExactOn(e))
    val ivf = sets(Ann.annIvfWith(e, cents, nprobe))
    val recalls = exact.map { case (q, truth) =>
      (ivf.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    val cand = Ann.annIvfCandidates(e, cents, nprobe)
    val fraction = cand.toDouble / (Ann.NQueries.toLong * clusteredN)
    info(f"trained IVF (nprobe $nprobe/$nlist): recall@10 $meanRecall%.3f, " +
      f"scored fraction $fraction%.3f")
    assert(meanRecall >= 0.8, f"trained IVF recall@10 $meanRecall%.3f < 0.8")
    assert(fraction <= 0.30, f"scored fraction $fraction%.3f above target")
  }

  test("PQ on a clustered corpus: ADC shortlist + exact re-rank keeps recall@10 >= 0.8") {
    val e = clusteredCorpus
    val exact = sets(Ann.annExactOn(e))
    val pq = Ann.annPqOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val pqSets = pq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      (pqSets.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"clustered corpus PQ (8x16 codebooks, shortlist 100/$clusteredN): " +
      f"recall@10 $meanRecall%.3f")
    assert(meanRecall >= 0.8, f"PQ recall@10 $meanRecall%.3f < 0.8")

    // the re-rank is EXACT cosine: any neighbor shared with the exact
    // result must carry an identical rounded score.
    val exactScore = Ann.annExactOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { case (q, n, s) =>
      exactScore.get((q, n)).foreach(es => assert(es == s, s"score mismatch for ($q,$n)"))
    }
  }

  test("PQ index: m codes per vector, codes dense in [0, ksub), 32x smaller than floats") {
    val (m, ksub) = (8, 16)
    val (codebook, codes) = Ann.pqIndex(clusteredCorpus, m, ksub)
    assert(codebook.count() == m.toLong * ksub, "codebook not dense")
    val rows = codes.collect()
    assert(rows.length == clusteredN)
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == m, s"vector ${r.getLong(0)} has ${cs.length} codes")
      assert(cs.forall(c => c >= 0 && c < ksub), s"code out of range: $cs")
    }
    // the scan set is m bytes of code per vector vs 4*64 float bytes
    info(f"PQ scan payload: $m bytes/vector vs ${4 * 64} — ${4 * 64 / m}x compression")
  }

  test("SQ8 on a clustered corpus: byte-dot shortlist + exact re-rank keeps recall@10 >= 0.95") {
    val e = clusteredCorpus
    val exact = sets(Ann.annExactOn(e))
    val sq = sets(Ann.annSq8On(e))
    val recalls = exact.map { case (q, truth) =>
      (sq.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"clustered corpus SQ8 (uniform 8-bit, shortlist 100/$clusteredN): " +
      f"recall@10 $meanRecall%.3f")
    // SQ8 is the HIGH-FIDELITY compression point: the floor sits well
    // above PQ's (per-component error <= step/2 vs subspace centroids)
    assert(meanRecall >= 0.95, f"SQ8 recall@10 $meanRecall%.3f < 0.95")
  }

  test("SQ8 index: 64 byte codes per vector, reconstruction error <= step/2 per component") {
    val codes = Ann.sq8Index(clusteredCorpus).collect()
    assert(codes.length == clusteredN)
    val step = codes.head.getAs[Double]("step")
    val lo = codes.head.getAs[Double]("lo")
    assert(step > 0 && codes.forall(r => r.getAs[Double]("step") == step),
      "uniform quantization: one global step")
    codes.foreach { r =>
      val cs = r.getSeq[Byte](1)
      assert(cs.length == 64, s"vector ${r.getLong(0)} has ${cs.length} codes")
    }
    // reconstruct one vector and bound the error against the normalized
    // original: |x - (lo + (c+128)*step)| <= step/2 + float rounding
    import org.apache.spark.sql.functions._
    val normed = clusteredCorpus
      .select(col("vec_id"), transform(col("embedding"),
        x => x / sqrt(aggregate(col("embedding"), lit(0.0d), (a, y) => a + y * y))).as("vec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    codes.take(20).foreach { r =>
      val xs = normed(r.getLong(0))
      r.getSeq[Byte](1).zip(xs).foreach { case (c, x) =>
        val rec = lo + (c.toDouble + 128.0) * step
        assert(math.abs(rec - x) <= step / 2 + 1e-6,
          s"reconstruction error ${math.abs(rec - x)} > step/2=$step")
      }
    }
    info(f"SQ8 scan payload: 64 bytes/vector vs ${4 * 64} — 4x compression, step=$step%.6f")
  }

  test("IVFPQ on a clustered corpus: composed pruning keeps recall@10 >= 0.8") {
    val e = clusteredCorpus
    val exact = sets(Ann.annExactOn(e))
    val ivfpq = sets(Ann.annIvfPqOn(e))
    val recalls = exact.map { case (q, truth) =>
      (ivfpq.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"clustered corpus IVFPQ (nprobe 4/16 lists x 8-byte codes, " +
      f"shortlist 100/$clusteredN): recall@10 $meanRecall%.3f")
    assert(meanRecall >= 0.8, f"IVFPQ recall@10 $meanRecall%.3f < 0.8")

    // re-rank scores are exact cosine (same invariant as s02/s05)
    val exactScore = Ann.annExactOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Ann.annIvfPqOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .foreach { case (q, n, sc) =>
        exactScore.get((q, n)).foreach(es => assert(es == sc, s"score mismatch for ($q,$n)"))
      }
  }

  test("filtered ANN composes with the index paths: recall and pruning at 1-in-3 selectivity") {
    import org.apache.spark.sql.functions.{abs => fabs, col, lit, xxhash64}
    // ~1-in-3 metadata predicate, decorrelated from cluster structure
    val e = clusteredCorpus.withColumn("label",
      fabs(xxhash64(col("vec_id"), lit(7))).mod(3).cast("int"))
    val pred = col("label") === 0
    val eligible = e.where(pred).count()
    assert(eligible > clusteredN / 4 && eligible < clusteredN / 2, s"selectivity drifted: $eligible")
    val exact = sets(Ann.annExactFilteredOn(e, pred))

    // s03 composition: the filter rides the trained-IVF probe
    val nlist = 16; val nprobe = 4
    val cents = Ann.trainCentroids(e, nlist)
    val ivf = sets(Ann.annIvfWith(e, cents, nprobe, corpusPred = Some(pred)))
    val rIvf = exact.map { case (q, truth) =>
      (ivf.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size }
    val mIvf = rIvf.sum / rIvf.size
    // the scored-set witness: candidates shrink with the predicate and
    // stay ~nprobe/nlist of the ELIGIBLE corpus
    val candF = Ann.annIvfCandidates(e, cents, nprobe, corpusPred = Some(pred))
    val candU = Ann.annIvfCandidates(e, cents, nprobe)
    val fraction = candF.toDouble / (Ann.NQueries.toLong * eligible)
    info(f"filtered IVF (nprobe $nprobe/$nlist, ${eligible}x eligible): recall@10 $mIvf%.3f, " +
      f"scored fraction $fraction%.3f of eligible, candidates $candF vs unfiltered $candU")
    assert(mIvf >= 0.8, f"filtered IVF recall@10 $mIvf%.3f < 0.8")
    assert(candF < candU * 6 / 10, s"filter did not prune the scored set: $candF vs $candU")
    assert(fraction <= 0.55, f"scored fraction $fraction%.3f of the eligible corpus too high")

    // s06 composition: the filter rides the codes scan before ADC
    val ivfpq = sets(Ann.annIvfPqOn(e, coarse = Some(cents), nprobe = nprobe,
      corpusPred = Some(pred)))
    val rPq = exact.map { case (q, truth) =>
      (ivfpq.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size }
    val mPq = rPq.sum / rPq.size
    info(f"filtered IVFPQ: recall@10 $mPq%.3f")
    assert(mPq >= 0.8, f"filtered IVFPQ recall@10 $mPq%.3f < 0.8")
    // pre-filter, not post-filter: every returned neighbor satisfies
    // the predicate, and full k comes back for every query
    val eligibleIds = e.where(pred).select("vec_id").collect().map(_.getLong(0)).toSet
    (ivf.values ++ ivfpq.values).foreach(ns => assert(ns.forall(eligibleIds)))
    ivf.foreach { case (q, ns) => assert(ns.size == Ann.K, s"query $q starved: ${ns.size}") }
  }

  test("s01 exact: self is excluded and ranks are dense per query") {
    val rows = Ann.s01AnnBruteforce(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self-match leaked")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to Ann.K), "ranks not dense")
    }
  }

  test("s07 lifecycle: same-distribution appends compact; drift triggers re-encode that restores recall") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("pqlife").toString + "/idx"
    val lake = new graft.sources.Snapshots(spark, root)
    val corpus = clusteredCorpus // trained distribution (centers seed 42)
    val (cb0, codes0) = Ann.pqIndex(corpus)
    lake.commit(Map("codebook" -> cb0, "codes" -> codes0,
      "stats" -> {
        val sp = spark; import sp.implicits._
        Seq(Ann.pqQuantError(corpus, cb0)).toDF("train_err")
      }))

    // phase 1 — appends ≫ the drip rate, SAME distribution: the drift
    // probe must stay quiet and maintenance must be pure layout work
    val sameDist = clusteredVecs(42, 960, idsFrom = 10000L)
    sameDist.cache().count()
    lake.append("codes", Ann.pqEncode(sameDist, lake.read("codebook")), tag = Some("life1"))
    val filesBefore = lake.read("codes").inputFiles.length
    val action1 = Ann.maintainPqLake(lake, recentVecs = sameDist,
      allVecs = corpus.unionByName(sameDist))
    assert(action1 == "compacted", s"same-distribution appends must not re-encode: $action1")
    val filesAfter = lake.read("codes").inputFiles.length
    assert(filesAfter < filesBefore,
      s"compaction must shrink the codes file count ($filesBefore -> $filesAfter)")
    assert(lake.read("codes").count() == 1920L)

    // phase 2 — a DRIFTED distribution (fresh centers): encoding under
    // the frozen codebooks degrades, the probe fires, maintenance
    // retrains + re-encodes atomically
    val drifted = clusteredVecs(99, 960, idsFrom = 20000L)
    drifted.cache().count()
    val cbOld = lake.read("codebook")
    val errOld = Ann.pqQuantError(drifted, cbOld)
    lake.append("codes", Ann.pqEncode(drifted, cbOld), tag = Some("life2"))
    val all = corpus.unionByName(sameDist).unionByName(drifted)
    val action2 = Ann.maintainPqLake(lake, recentVecs = drifted, allVecs = all)
    assert(action2 == "re-encoded", s"drifted appends must re-encode: $action2")
    assert(lake.read("codes").count() == 2880L)
    // the rebuilt codebooks actually FIT the drifted data again
    val errNew = Ann.pqQuantError(drifted, lake.read("codebook"))
    info(f"drifted-batch quantization error: old codebook $errOld%.4f, rebuilt $errNew%.4f")
    assert(errNew < errOld,
      f"re-encode must cut the drifted batch's quantization error ($errOld%.4f -> $errNew%.4f)")
    // and recall on the post-drift corpus holds through the lake index
    val exact = sets(Ann.annExactOn(all))
    val viaLake = sets(Ann.annPqOn(all,
      index = Some((lake.read("codebook"), lake.read("codes")))))
    val recalls = exact.map { case (q, truth) =>
      (viaLake.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"post-re-encode recall@10 over the mixed corpus: $meanRecall%.3f")
    assert(meanRecall >= 0.8, f"recall after lifecycle maintenance $meanRecall%.3f < 0.8")
    // replayed append tags survived the re-commit: replay is a no-op
    val head = lake.currentVersion.get
    lake.append("codes", Ann.pqEncode(sameDist, lake.read("codebook")), tag = Some("life1"))
    assert(lake.currentVersion.get == head, "replayed tagged append must no-op after re-encode")
  }

  test("s07 incremental append: appended vectors are searchable, append is O(batch) and replay-safe") {
    val r1 = Ann.s07AnnIndexAppend(spark, dir).collect()
    // the appended batch duplicates each query under id+100000, so the
    // updated index must surface the duplicate as the new top-1 at
    // cos ~1.0 — proof the appended codes actually entered the scan
    r1.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getLong(2) == r.getLong(0) + 100000L,
        s"query ${r.getLong(0)} top-1 is ${r.getLong(2)}, not its appended duplicate")
      assert(r.getDouble(3) > 0.999, s"duplicate cos ${r.getDouble(3)} should be ~1")
    }
    // replay: the tagged append is a no-op, results identical
    val r2 = Ann.s07AnnIndexAppend(spark, dir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "replayed append changed the index")
  }

  test("index DELETE: the lake's keyset verb removes vectors from the searchable set") {
    val sp = spark
    import sp.implicits._
    // the index IS a Snapshots lake, so deletion needs no ANN-specific
    // machinery: clone the codes table (zero-copy — the shared staged
    // fixture stays intact), keyset-delete from the clone, search the
    // clone. Re-runs converge: an already-deleted victim just yields a
    // fresh current top-1 to delete.
    val lake = Ann.pqLakeStaged(spark, dir)
    if (!lake.hasTable("codes_del")) lake.cloneTable("codes", "codes_del")
    val e = graft.pipeline.emb(spark, dir)
    val cb = lake.read("codebook")
    def search() = Ann.annPqOn(e, index = Some((cb, lake.read("codes_del"))))
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id")))
    val before = search()
    val victim = before.filter(_._1 == 0L).minBy(_._2)._3
    lake.deleteKeys("codes_del", Seq(victim).toDF("vec_id"), "vec_id")
    val after = search()
    assert(!after.exists(_._3 == victim), s"deleted vector $victim still searchable")
    // the shortlist refills: every query still returns a full top-k
    assert(after.groupBy(_._1).forall(_._2.length == Ann.K),
      "deletion must not shrink other queries' result sets")
    // replay converges to the identical board
    lake.deleteKeys("codes_del", Seq(victim).toDF("vec_id"), "vec_id")
    assert(search().toSeq == after.toSeq, "replayed delete changed the index")
  }

  test("s14 CALL ann_search parity: the SQL surface returns exactly the Scala exact top-k") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("annsql").toString
    sp.conf.set("spark.sql.catalog.gann", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gann.root", root)
    sp.sql("CREATE NAMESPACE gann.db")
    graft.sources.Catalog.register(sp, dir)
    sp.sql("CREATE TABLE gann.db.emb (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gann.db.emb SELECT vec_id, embedding FROM embeddings")

    val e = sp.sql("SELECT vec_id, embedding FROM embeddings")
    (0L to 2L).foreach { qid =>
      val q = sp.sql(s"SELECT embedding FROM embeddings WHERE vec_id = $qid").head
        .getSeq[Float](0).mkString(",")
      val called = sp.sql(s"CALL gann.system.ann_search('db', 'emb', '$q', 8)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // the Scala exact path over the SAME contract (self included):
      // rank 1 must be the query vector itself at cos 1.0
      assert(called.head._1 == 1L && called.head._2 == qid && called.head._3 == 1.0,
        s"q$qid rank-1 must be self: ${called.head}")
      val scala_ = Ann.annExactOn(e, nQueries = (qid + 1).toInt, k = 7)
        .where(col("q_id") === qid).collect()
        .map(r => (r.getLong(1) + 1, r.getLong(2), r.getDouble(3))).toSeq
      assert(called.tail == scala_,
        s"q$qid: CALL ${called.tail} != Scala $scala_")
    }

    // the FILTERED form (s08's pre-filter contract as text): the
    // predicate lands on the scan — every neighbor satisfies it, the
    // heap still fills to k from eligible candidates only
    sp.sql("CREATE TABLE gann.db.embl (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)")
    sp.sql("""INSERT INTO gann.db.embl
             |SELECT vec_id, embedding, CAST(pmod(vec_id, 3) AS INT) FROM embeddings""".stripMargin)
    val q0 = sp.sql("SELECT embedding FROM embeddings WHERE vec_id = 0").head
      .getSeq[Float](0).mkString(",")
    val filtered = sp.sql(
      s"CALL gann.system.ann_search_where('db', 'embl', '$q0', 8, 'label = 2')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(filtered.size == 8)
    assert(filtered.forall { case (_, n, _) => n % 3 == 2 },
      s"every filtered neighbor must satisfy the predicate: $filtered")
    // parity with the exact filtered ground truth computed inline
    val truth = e.where(pmod(col("vec_id"), lit(3)) === 2)
      .select(col("vec_id"),
        graft.functions.functions.cosine_sim(col("embedding"),
          array(q0.split(",").map(v => lit(v.toDouble).cast("float")): _*)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(8).collect()
      .map(_.getLong(0)).toSeq
    assert(filtered.map(_._2) == truth, s"CALL ${filtered.map(_._2)} != truth $truth")
  }

  test("s17 CALL ann_join: batched table-to-table search == per-query exact, chunk-invariant") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("annjoin").toString
    sp.conf.set("spark.sql.catalog.gaj", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gaj.root", root)
    sp.sql("CREATE NAMESPACE gaj.db")
    graft.sources.Catalog.register(sp, dir)
    sp.sql("CREATE TABLE gaj.db.emb (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gaj.db.emb SELECT vec_id, embedding FROM embeddings")
    sp.sql("CREATE TABLE gaj.db.q (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gaj.db.q SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5")

    val summary = sp.sql("CALL gaj.system.ann_join('db', 'emb', 'q', 8, 'knn')").head
    assert(summary.getLong(1) == 5L, s"queries count: $summary")
    assert(summary.getLong(2) == 40L, s"rows written: $summary")

    val out = sp.sql("SELECT * FROM gaj.db.knn ORDER BY q_id, rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 40)
    // per-query parity with the single-vector CALL (same self-included contract)
    (0L to 4L).foreach { qid =>
      val qv = sp.sql(s"SELECT embedding FROM embeddings WHERE vec_id = $qid").head
        .getSeq[Float](0).mkString(",")
      val single = sp.sql(s"CALL gaj.system.ann_search('db', 'emb', '$qv', 8)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val batched = out.filter(_._1 == qid).map(t => (t._2, t._3, t._4)).toSeq
      assert(batched == single, s"q$qid: batched $batched != single-CALL $single")
    }

    // chunking is a memory knob, never a semantics knob: 3 hash chunks
    // return the identical result set as the single-broadcast plan
    val e = sp.sql("SELECT vec_id, embedding FROM embeddings")
    val q5 = e.where(col("vec_id") < 5)
    val one = Ann.annJoinOn(e, q5, 8, nChunks = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val three = Ann.annJoinOn(e, q5, 8, nChunks = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(one == three, "chunked plan diverged from single-broadcast plan")

    // loud refusals: clobbering an input, and an empty query set
    val clobber = intercept[Exception](
      sp.sql("CALL gaj.system.ann_join('db', 'emb', 'q', 8, 'emb')").collect())
    assert(clobber.getMessage.contains("must differ"), clobber.getMessage)
    sp.sql("CREATE TABLE gaj.db.q0 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    val empty = intercept[Exception](
      sp.sql("CALL gaj.system.ann_join('db', 'emb', 'q0', 8, 'knn2')").collect())
    assert(empty.getMessage.contains("empty query table"), empty.getMessage)

    // dimensionality contract: the codegen cosine computes over
    // min(len), so a dim-mismatched query set/vector must refuse
    // loudly instead of silently truncating every score
    sp.sql("CREATE TABLE gaj.db.q3 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gaj.db.q3 VALUES (0, array(CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT), CAST(0.3 AS FLOAT)))")
    val dimJoin = intercept[Exception](
      sp.sql("CALL gaj.system.ann_join('db', 'emb', 'q3', 8, 'knn3')").collect())
    assert(dimJoin.getMessage.contains("dimensions"), dimJoin.getMessage)
    val dimSearch = intercept[Exception](
      sp.sql("CALL gaj.system.ann_search('db', 'emb', '0.1,0.2,0.3', 8)").collect())
    assert(dimSearch.getMessage.contains("dimensions"), dimSearch.getMessage)
  }

  test("s15 CALL ann_index_ivf/ann_search_ivf: full-probe == exact, nprobe=1 stays in-list, rank-1 self") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("annivfsql").toString
    sp.conf.set("spark.sql.catalog.gaiv", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gaiv.root", root)
    sp.sql("CREATE NAMESPACE gaiv.db")
    graft.sources.Catalog.register(sp, dir)
    sp.sql("CREATE TABLE gaiv.db.emb (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gaiv.db.emb SELECT vec_id, embedding FROM embeddings")

    val snap = new graft.sources.Snapshots(sp, root + "/db")
    val preBuild = snap.currentVersion.get
    val built = sp.sql(
      "CALL gaiv.system.ann_index_ivf('db', 'emb', 'emb_ivf', 8)").head
    assert(built.getInt(1) == 8, s"explicit nlist must be honored: $built")
    val nVecs = built.getLong(2)
    assert(snap.read("emb_ivf").count() == nVecs,
      "every corpus vector must be assigned to exactly one list")
    assert(snap.read("emb_ivf_cents").count() == 8L)
    // ATOMICITY: centroids + assignments land in ONE manifest commit —
    // no intermediate version can pair new centroids with old lists
    assert(snap.currentVersion.get == preBuild + 1,
      s"index build must publish exactly one version " +
        s"(${preBuild} -> ${snap.currentVersion.get})")

    // a wrong-dimensionality query vector refuses loudly (silent
    // truncation would probe the wrong lists)
    val dimErr = intercept[Exception] {
      sp.sql("CALL gaiv.system.ann_search_ivf('db', 'emb_ivf', '0.1,0.2,0.3', 5, 2)").collect()
    }
    assert(dimErr.getMessage.contains("dimensions"), dimErr.getMessage)

    val q = sp.sql("SELECT embedding FROM embeddings WHERE vec_id = 0").head
      .getSeq[Float](0)
    val qs = q.mkString(",")

    // FULL probe (nprobe = nlist) scans every list → must equal the
    // exact top-k over the corpus, self included at rank 1 / cos 1.0
    val full = sp.sql(s"CALL gaiv.system.ann_search_ivf('db', 'emb_ivf', '$qs', 10, 8)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(full.head._2 == 0L && full.head._3 == 1.0,
      s"rank-1 must be the query itself: ${full.head}")
    val exact = sp.sql("SELECT vec_id, embedding FROM embeddings")
      .select(col("vec_id"),
        graft.functions.functions.cosine_sim(col("embedding"),
          array(q.map(v => lit(v)): _*)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(10).collect()
      .map(_.getLong(0)).toSeq
    assert(full.map(_._2) == exact, s"full probe ${full.map(_._2)} != exact $exact")

    // nprobe = 1: every neighbor must come from the single probed list
    // (the query's own — it contains the query vector at cos 1.0)
    val one = sp.sql(s"CALL gaiv.system.ann_search_ivf('db', 'emb_ivf', '$qs', 10, 1)")
      .collect().map(_.getLong(1)).toSeq
    val cidOf = snap.read("emb_ivf").select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one.contains(0L), "the query's own list holds the query vector")
    assert(one.map(cidOf).distinct.size == 1,
      s"nprobe=1 neighbors must share one coarse list: ${one.map(cidOf)}")

    // rebuild with adaptive nlist republishes (idempotent CALL)
    val rebuilt = sp.sql(
      "CALL gaiv.system.ann_index_ivf('db', 'emb', 'emb_ivf', 0)").head
    assert(rebuilt.getInt(1) == graft.pipeline.Ann.adaptiveNlist(nVecs))

    // incremental maintenance: a NEW vector identical to the query
    // appends against the EXISTING centroids and is immediately
    // searchable at rank 2 (cos 1.0, higher id than the original self)
    sp.sql("CREATE TABLE gaiv.db.emb_new (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gaiv.db.emb_new SELECT vec_id + 5000000 AS vec_id, embedding " +
      "FROM embeddings WHERE vec_id = 0")
    val app = sp.sql(
      "CALL gaiv.system.ann_index_append('db', 'emb_new', 'emb_ivf')").head
    assert(app.getLong(1) == 1L)
    val afterApp = sp.sql(
      s"CALL gaiv.system.ann_search_ivf('db', 'emb_ivf', '$qs', 3, ${graft.pipeline.Ann.adaptiveNlist(nVecs)})")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(afterApp.take(2) == Seq((0L, 1.0), (5000000L, 1.0)),
      s"the appended twin must rank right after self: $afterApp")

    // dim guard: a batch whose vectors don't match the trained
    // centroids' dimensionality must refuse, never coarse-assign on
    // the truncated cosine
    sp.sql("CREATE TABLE gaiv.db.emb_bad (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sp.sql("INSERT INTO gaiv.db.emb_bad VALUES (9000000, array(CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT)))")
    val dimApp = intercept[Exception](
      sp.sql("CALL gaiv.system.ann_index_append('db', 'emb_bad', 'emb_ivf')").collect())
    assert(dimApp.getMessage.contains("dimensions"), dimApp.getMessage)

    // the _where form: metadata columns ride into the index table and
    // the predicate pre-filters INSIDE the probed lists — at full
    // probe it must equal the exact filtered top-k
    sp.sql("CREATE TABLE gaiv.db.embl (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)")
    sp.sql("""INSERT INTO gaiv.db.embl
             |SELECT vec_id, embedding, CAST(pmod(vec_id, 3) AS INT) FROM embeddings""".stripMargin)
    sp.sql("CALL gaiv.system.ann_index_ivf('db', 'embl', 'embl_ivf', 8)")
    assert(snap.read("embl_ivf").columns.toSeq == Seq("cid", "vec_id", "embedding", "label"))
    val fw = sp.sql(
      s"CALL gaiv.system.ann_search_ivf_where('db', 'embl_ivf', '$qs', 8, 8, 'label = 2')")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(fw.size == 8)
    assert(fw.forall(_._1 % 3 == 2), s"every neighbor must satisfy the predicate: $fw")
    val truthF = sp.sql("SELECT vec_id, embedding FROM embeddings")
      .where(pmod(col("vec_id"), lit(3)) === 2)
      .select(col("vec_id"),
        graft.functions.functions.cosine_sim(col("embedding"),
          array(q.map(v => lit(v)): _*)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(8).collect()
      .map(_.getLong(0)).toSeq
    assert(fw.map(_._1) == truthF, s"filtered full-probe ${fw.map(_._1)} != exact $truthF")
  }

  test("s16 recall gate: IVF/PQ/SQ8 recall@10 vs exact holds its floor on the real corpus at default knobs") {
    // the driver-visible key itself, run on the real sf0.01 corpus —
    // a quantizer regression (bad codebook, wrong probe selection,
    // broken shortlist) fails HERE by name instead of hiding behind
    // the full-probe==exact pins above. Floors sit well under the
    // measured values (ivf 0.57, pq 0.80, sq8 1.00 on r12's uniform
    // -random regen) to absorb per-round testdata regeneration noise
    // while still catching a halving.
    val sp = TestSpark.spark
    val rows = graft.pipeline.Ann.s16AnnRecall(sp, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    info(s"recall@10 on sf0.01: $rows")
    assert(rows("ivf_nprobe4") >= 0.35, s"IVF recall ${rows("ivf_nprobe4")} < 0.35")
    assert(rows("pq_m8") >= 0.60, s"PQ recall ${rows("pq_m8")} < 0.60")
    assert(rows("sq8") >= 0.85, s"SQ8 recall ${rows("sq8")} < 0.85")
  }
}
