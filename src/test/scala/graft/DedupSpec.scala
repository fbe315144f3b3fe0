package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.functions.simhash64
import graft.pipeline.{docs, tokens, wordTrigrams, Dedup}

/** Recall/exactness gates for the non-SQL-expressible dedup operators
  * (d02 MinHash, d03 SimHash) against brute-force ground truth at
  * sf0.001 (500 docs — all-pairs is affordable in a test, which is the
  * whole point of candidate-generation operators: production never
  * does what this test does).
  */
class DedupSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sfTest

  /** Brute-force shingle-Jaccard pairs at or above `thr`. */
  private def brutePairs(thr: Double): Set[(Long, Long)] = {
    val sh = docs(spark, dir)
      .select(col("doc_id"), wordTrigrams(tokens(col("text"))).as("sh"))
    val a = sh.toDF("a_id", "a_sh")
    val b = sh.toDF("b_id", "b_sh")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("j", col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .where(col("j") >= thr)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("d01 exact dedup: every content group has exactly the 2 planted copies") {
    val out = Dedup.d01DedupExact(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_copies") == 2L),
      "self-union must produce exactly 2 copies per distinct text")
    val nDocs = docs(spark, dir).count()
    assert(out.length == nDocs, "one surviving row per distinct text")
  }

  test("d02 MinHash/LSH finds all high-similarity pairs (recall vs brute force)") {
    val found = Dedup.d02DedupMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truthHigh = brutePairs(0.8) // banding (16×8) targets the j≥0.8 regime
    assert(truthHigh.nonEmpty, "test data should contain planted near-dups")
    val recall = (truthHigh & found).size.toDouble / truthHigh.size
    assert(recall >= 0.95, s"recall $recall < 0.95 (found ${found.size}, truth ${truthHigh.size})")
    // and everything it reports really is >= the 0.5 output threshold
    val truthAll = brutePairs(0.5)
    assert(found.subsetOf(truthAll), "d02 reported a pair below its own threshold")
  }

  test("d03 SimHash banking is exact for hamming <= 7") {
    // Brute force: all-pairs hamming over the same simhash values.
    val sh = docs(spark, dir)
      .select(col("doc_id"), simhash64(wordTrigrams(tokens(col("text")))).as("h"))
    val a = sh.toDF("a_id", "a_h")
    val b = sh.toDF("b_id", "b_h")
    val truth = a.join(b, col("a_id") < col("b_id"))
      .withColumn("hd", bit_count(col("a_h").bitwiseXOR(col("b_h"))))
      .where(col("hd") <= 7)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.d03DedupSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth,
      s"8×8-bit banking must be complete for hd<=7: missing ${truth -- found}, extra ${found -- truth}")
  }
}
