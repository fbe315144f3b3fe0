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

  test("dedup CALL procedures: dedup_minhash == Dedup.minhashPairs row-for-row; dedup_exact republishes the deduped table") {
    val sp = spark
    val root = java.nio.file.Files.createTempDirectory("dedupcall").toString
    sp.conf.set("spark.sql.catalog.gdd", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gdd.root", root)
    sp.sql("CREATE NAMESPACE gdd.db")
    docs(sp, dir).select(col("doc_id"), col("text"))
      .createOrReplaceTempView("dedup_call_src")
    sp.sql("CREATE TABLE gdd.db.corpus AS SELECT doc_id, text FROM dedup_call_src")

    // near-dup mining as text == the Scala pipeline, row for row
    val viaCall = sp.sql(
      "CALL gdd.system.dedup_minhash('db', 'corpus', 'doc_id', 'text', 0.5D, 10000)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaScala = Dedup.minhashPairs(
        new graft.sources.Snapshots(sp, root + "/db").read("corpus"),
        "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaCall == viaScala, s"CALL ${viaCall.size} vs Scala ${viaScala.size}")
    assert(viaCall.nonEmpty, "sf0.001 corpus plants near-dup pairs")

    // exact dedup as text: seed duplicates, CALL, table IS deduped
    sp.sql("CREATE OR REPLACE TABLE gdd.db.corpus AS " +
      "SELECT doc_id, text FROM dedup_call_src " +
      "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM dedup_call_src")
    val n = sp.sql("SELECT count(*) FROM gdd.db.corpus").head.getLong(0)
    val res = sp.sql("CALL gdd.system.dedup_exact('db', 'corpus', 'text')").head
    assert(res.getLong(1) == n, "rows_before")
    assert(res.getLong(2) == n / 2, "every text planted exactly twice")
    assert(sp.sql("SELECT count(*) FROM gdd.db.corpus").head.getLong(0) == n / 2)
    // keep policy: the minimum non-key tuple — the UNSHIFTED ids survive
    assert(sp.sql("SELECT max(doc_id) FROM gdd.db.corpus").head.getLong(0) < 100000L)
  }

  test("dedup_containment CALL == Dedup.containmentPairs; finds planted truncations; dedup_exact tolerates NULLs in the anchor column") {
    val sp = spark
    val root = java.nio.file.Files.createTempDirectory("dedupcont").toString
    sp.conf.set("spark.sql.catalog.gdc", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gdc.root", root)
    sp.sql("CREATE NAMESPACE gdc.db")
    // the d14 fixture shape as a TABLE: every 4th doc gains a
    // half-length truncated copy (+300000) — containment 1.0
    docs(sp, dir).select(col("doc_id"), col("text"))
      .createOrReplaceTempView("cont_call_src")
    sp.sql("""CREATE TABLE gdc.db.corpus AS
             |SELECT doc_id, text FROM cont_call_src
             |UNION ALL
             |SELECT doc_id + 300000 AS doc_id,
             |       array_join(slice(split(text, ' '), 1,
             |         CAST(size(split(text, ' ')) / 2 AS INT)), ' ') AS text
             |FROM cont_call_src WHERE doc_id % 4 = 0""".stripMargin)
    val viaCall = sp.sql(
      "CALL gdc.system.dedup_containment('db', 'corpus', 'doc_id', 'text', 0.9D, 10000)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaScala = Dedup.containmentPairs(
        new graft.sources.Snapshots(sp, root + "/db").read("corpus"),
        "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaCall == viaScala, s"CALL ${viaCall.size} vs Scala ${viaScala.size}")
    // every planted truncation pair is found at containment 1.0
    val planted = docs(sp, dir).where(col("doc_id") % 4 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val foundA = viaCall.filter(_._3 >= 0.9999).map(_._1)
    assert(planted.subsetOf(foundA),
      s"missing planted truncations: ${planted -- foundA}")

    // dedup_exact over a table whose FIRST column carries NULLs: the
    // unbounded replaceWhere range's matchCond is lit(true), so the
    // null-anchored republish must succeed (pins the contract)
    sp.sql("""CREATE TABLE gdc.db.nullfirst AS
             |SELECT CASE WHEN doc_id % 3 = 0 THEN NULL ELSE doc_id END AS k, text
             |FROM cont_call_src
             |UNION ALL
             |SELECT CASE WHEN doc_id % 3 = 0 THEN NULL ELSE doc_id END AS k, text
             |FROM cont_call_src""".stripMargin)
    val n = sp.sql("SELECT count(*) FROM gdc.db.nullfirst").head.getLong(0)
    val res = sp.sql("CALL gdc.system.dedup_exact('db', 'nullfirst', 'text')").head
    assert(res.getLong(1) == n, "rows_before")
    assert(res.getLong(2) == n / 2, "every text planted exactly twice")
    assert(sp.sql("SELECT count(*) FROM gdc.db.nullfirst").head.getLong(0) == n / 2)
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

  test("d04 finds exactly the brute-force pairs at j >= 0.6") {
    val found = Dedup.d04DedupNgram(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = brutePairs(0.6)
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    assert(found == truth,
      s"df-capped candidates + exact verify must still be exact here: " +
        s"missing ${truth -- found}, extra ${found -- truth}")
  }

  test("d04 df cap bounds the candidate explosion from a boilerplate shingle") {
    val sp = spark
    import sp.implicits._
    // 100 docs with doc-specific vocabulary (no cross-doc trigrams),
    // then the SAME 5-word boilerplate sentence appended to half of
    // them: 3 injected trigrams with df=50. An uncapped inverted index
    // pays C(50,2)=1225 candidate pairs for them; the cap drops the
    // boilerplate postings so candidate count must stay ~0.
    val docsDf = (0 until 100).map { i =>
      val own = (0 until 12).map(w => s"w${i}_$w").mkString(" ")
      val text = if (i < 50) own + " the quick brown fox jumps" else own
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val sets = Dedup.hashSets(
      docsDf.withColumn("toks", org.apache.spark.sql.functions.split(col("text"), " ")))
    val capped = Dedup.ngramCandidates(sets, maxDf = 16).count()
    val uncapped = Dedup.ngramCandidates(sets, maxDf = Int.MaxValue).count()
    assert(uncapped >= 1225L, s"without the cap the boilerplate must explode (got $uncapped)")
    // boundary trigrams (own-suffix + boilerplate-prefix) are doc-specific
    // and never shared, so the cap should remove every candidate
    assert(capped == 0L, s"df cap must drop boilerplate-only candidates (got $capped)")
  }

  test("ShinglePairs emits exactly the a<b pairs of every <=cap group (r12 operator)") {
    val sp = spark
    import sp.implicits._
    // groups: size 1 (no pairs), 2, 3, exactly cap, cap+1 (dropped),
    // plus ids arriving UNSORTED within a group
    val cap = 4
    val postings = Seq(
      (10L, 7L),
      (11L, 3L), (11L, 9L),
      (12L, 5L), (12L, 1L), (12L, 8L),
      (13L, 4L), (13L, 2L), (13L, 6L), (13L, 0L),
      (14L, 1L), (14L, 2L), (14L, 3L), (14L, 4L), (14L, 5L)
    ).toDF("h", "doc_id")
    val got = graft.plans.ShinglePairs.pairs(postings, "h", "doc_id", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def combos(ids: Seq[Long]): Seq[(Long, Long)] = {
      val s = ids.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }
    val want = combos(Seq(3L, 9L)) ++ combos(Seq(5L, 1L, 8L)) ++ combos(Seq(4L, 2L, 6L, 0L))
    assert(got.sorted == want.sorted,
      s"pairs mismatch: got ${got.sorted}, want ${want.sorted}")
    // parity with the r11 posting self-join on real data: same candidate set
    val sets = Dedup.hashSets(
      docs(spark, dir).withColumn("toks", tokens(col("text"))))
    val inv = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val rare = inv.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") <= 64).select("h")
    val pruned = inv.join(rare, Seq("h")).select(col("h"), col("doc_id"))
    val ref = pruned.toDF("h", "a_id").join(pruned.toDF("h", "b_id"), Seq("h"))
      .where(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val op = Dedup.ngramCandidates(sets, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(op == ref, s"operator candidates must equal the self-join form: " +
      s"missing ${ref -- op}, extra ${op -- ref}")
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
