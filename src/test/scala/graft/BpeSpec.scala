package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Bpe

/** The distributed BPE trainer's correctness burden: equality with an
  * in-memory reference implementation on fixtures (deterministic
  * tiebreaks make the match exact), plus merge-table invariants on
  * arbitrary input.
  */
class BpeSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def toVocab(words: Map[String, Long]) = {
    val sp = spark
    import sp.implicits._
    words.toSeq.toDF("word", "freq")
  }

  test("classic subword example: merges match the reference trainer exactly") {
    // the Sennrich example shape: shared suffixes dominate pair counts
    val words = Map(
      "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val k = 8
    val dist = Bpe.train(toVocab(words), k)
    val ref = Bpe.trainReference(words, k)
    assert(dist == ref,
      s"distributed merges diverged:\n  dist=$dist\n  ref =$ref")
    // the first merge must be the most frequent pair: (e,s) with freq 9
    assert(dist.head._2 == "e" && dist.head._3 == "s" && dist.head._5 == 9L)
  }

  test("tie frequencies break deterministically (pair-lexicographic)") {
    // every adjacent pair in "abcd" has freq 1 — the (l, r) ascending
    // tiebreak must pick (a, b) first in BOTH implementations
    val words = Map("abcd" -> 1L)
    val dist = Bpe.train(toVocab(words), 3)
    val ref = Bpe.trainReference(words, 3)
    assert(dist == ref)
    assert(dist.map(m => (m._2, m._3)) == Seq(("a", "b"), ("ab", "c"), ("abc", "d")))
  }

  test("supplementary-plane symbols: segmentation and tie order agree across engines") {
    // "𝄞" (U+1D11E) is a surrogate pair in UTF-16: a code-unit split
    // would halve it, and UTF-16 order puts it BELOW "�" while
    // UTF-8 binary order (Spark's sort) puts it ABOVE — both traps at
    // once. The reference must match the distributed trainer anyway.
    val clef = new String(Character.toChars(0x1D11E))
    val ufffd = "\uFFFD"
    val words = Map(
      s"a${clef}b" -> 3L,      // pairs (a,𝄞), (𝄞,b)
      s"a${ufffd}b" -> 3L)    // pairs (a,\uFFFD), (\uFFFD,b) — same freqs, tie on order
    val dist = Bpe.train(toVocab(words), 4)
    val ref = Bpe.trainReference(words, 4)
    assert(dist == ref,
      s"non-BMP merges diverged:\n  dist=$dist\n  ref =$ref")
    assert(ref.exists(m => m._2 == clef || m._3 == clef),
      "the clef must survive as ONE symbol (code-point segmentation)")
  }

  test("merges are non-overlapping left-to-right (the aaa case)") {
    // "aaaa"×3: pair (a,a) has freq 9 (3 slots × 3). After merging,
    // each word is [aa, aa] — the fold must NOT re-merge its own output
    // within the same step
    val words = Map("aaaa" -> 3L)
    val dist = Bpe.train(toVocab(words), 2)
    val ref = Bpe.trainReference(words, 2)
    assert(dist == ref)
    assert(dist(0)._4 == "aa" && dist(0)._5 == 9L)
    assert(dist(1)._4 == "aaaa" && dist(1)._5 == 3L, s"second merge: ${dist(1)}")
  }

  test("randomized vocabularies: distributed == reference (model-based)") {
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 3) {
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }
      val dist = Bpe.train(toVocab(words), 6)
      val ref = Bpe.trainReference(words, 6)
      assert(dist == ref, s"round $round diverged on $words")
    }
  }

  test("t15 key: merge table is well-formed on the real corpus") {
    val df = Bpe.t15BpeTrain(spark, TestSpark.sfTest, k = 6)
    val rows = df.collect()
    assert(rows.length == 6)
    // steps are dense and ordered; merged = left || right; freqs are
    // positive and non-increasing is NOT required (later merges can beat
    // earlier composites), but every freq must be > 0
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L))
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // determinism: a second run learns the identical table
    val again = Bpe.t15BpeTrain(spark, TestSpark.sfTest, k = 6).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("t22 encode: distributed == in-memory reference on the real corpus; invariants hold") {
    val k = 6
    val out = Bpe.t22BpeEncode(spark, TestSpark.sfTest, k).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    assert(out.nonEmpty)
    // in-memory reference: same tokenization (single-space corpus),
    // reference-trained merges, applyMerges per word occurrence
    val docsRows = graft.pipeline.docs(spark, TestSpark.sfTest)
      .select("doc_id", "text").collect()
    val perDoc: Map[Long, Seq[String]] = docsRows.map(r =>
      r.getLong(0) -> r.getString(1).split(" ", -1).toSeq.filter(_.nonEmpty)).toMap
    val freqs = perDoc.values.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val merges = Bpe.trainReference(freqs, k).map(m => (m._2, m._3))
    val encLen: Map[String, Int] =
      freqs.keys.map(w => w -> Bpe.applyMerges(w, merges).length).toMap
    perDoc.foreach { case (id, ws) =>
      val expect = (ws.size.toLong, ws.map(w => encLen(w).toLong).sum)
      assert(out(id) == expect, s"doc $id: got ${out(id)} expect $expect")
    }
    // invariants: encoding is lossless per word (symbols concat back),
    // and the trained merges genuinely compress (fewer tokens than
    // chars overall — a no-op encoder would fail this)
    freqs.keys.take(200).foreach { w =>
      assert(Bpe.applyMerges(w, merges).mkString == w)
    }
    val totToks = out.values.map(_._2).sum
    val totChars = perDoc.values.flatten.map(_.length.toLong).sum
    assert(totToks < totChars, s"merges must compress: $totToks vs $totChars")
  }
}
