package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextOps

/** Property tests for the text operators on constructed inputs (the
  * synthetic corpus is vocabulary-uniform, so real multilingual
  * snippets are the honest accuracy check for the lang-id heuristic).
  */
class TextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stop_count / distinct_tokens kernels match the builtin forms, incl. null tokens") {
    import org.apache.spark.sql.functions._
    import graft.functions.functions.{stop_count, distinct_tokens}
    val sp = spark
    import sp.implicits._
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val rows = Seq(
      Seq("the", "cat", "the", "a", "dog"),
      Seq("x"), Seq.empty[String],
      Seq("the", null, "the", null, "of"),
      Seq(null, null),
      Seq("is", "is", "is", "zzz", "zzz")).map(Tuple1(_))
    val df = rows.toDF("toks")
    val got = df.select(
      stop_count(col("toks"), stops).as("sc"),
      distinct_tokens(col("toks")).as("dt"),
      size(filter(col("toks"), t => t.isin(stops.map(x => x: Any): _*))).cast("long").as("sc0"),
      size(array_distinct(col("toks"))).as("dt0")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), s"stop_count drift: $r")
      assert(r.getInt(1) == r.getInt(3), s"distinct_tokens drift: $r")
    }
  }

  test("normalize_alnum kernel is byte-identical to the two-regex + trim ladder") {
    import org.apache.spark.sql.functions._
    import graft.functions.functions.normalize_alnum
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "Hello, World!  This is   a TEST.",
      "", " ", "   ", "...", "a", " a ", "a  b", "-a-b-",
      "tabs\tand\nnewlines\r\nhere",
      "digits 0123456789 stay, symbols #$%^& go",
      "unicode: café naïve 中文词 😀 end",
      "ß sharp-s and İ dotted-I and K kelvin",
      "mixed nbsp and zero​width",
      "UPPER lower 42x7")
    val df = cases.toDF("text")
    val got = df.select(
      normalize_alnum(lower(col("text"))).as("k"),
      trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " ")).as("r")).collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"drift on <$in>: kernel=<${r.getString(0)}> regex=<${r.getString(1)}>")
    }
  }

  test("t01 heuristic identifies real multilingual snippets") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and looked out of the window", "en"),
      (2L, "der hund und die katze sind nicht im haus und das ist gut", "de"),
      (3L, "le chat est dans le jardin et les oiseaux sont dans une cage", "fr"),
      (4L, "el perro y los gatos es una familia y las casas son grandes", "es"),
      (5L, "zzz qqq xxx", "und"))
    val df = samples.toDF("doc_id", "text", "expected")
    val out = TextOps.langIdFrame(df.select("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    samples.foreach { case (id, _, exp) =>
      assert(out(id) == exp, s"doc $id: expected $exp got ${out(id)}")
    }
  }

  test("SQL text functions return exactly the Scala operators' columns (one expression, no drift)") {
    import org.apache.spark.sql.functions._
    val sp = spark
    val dir = TestSpark.sfTest
    graft.pipeline.docs(sp, dir).createOrReplaceTempView("sqlfn_docs")
    val viaSql = sp.sql(
      """SELECT doc_id, lang_id(text) AS pred_lang, quality_score(text) AS q,
        |       token_count(text) AS n, doc_fingerprint(text) AS fp
        |FROM sqlfn_docs ORDER BY doc_id""".stripMargin).collect()
    val viaScala = graft.pipeline.docs(sp, dir)
      .select(col("doc_id"), TextOps.langIdCol(col("text")).as("pred_lang"),
        TextOps.qualityScoreCol(col("text")).as("q"),
        TextOps.tokenCountCol(col("text")).as("n"),
        TextOps.fingerprintCol(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaScala.toSeq)
    // and the Col form equals the original frame operators
    val frame = TextOps.langIdFrame(graft.pipeline.docs(sp, dir))
      .select("doc_id", "pred_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    viaScala.foreach(r => assert(frame(r.getLong(0)) == r.getString(1),
      s"langIdCol diverges from langIdFrame at doc ${r.getLong(0)}"))
  }

  test("t04 fingerprint is invariant to case, punctuation and extra whitespace") {
    import spark.implicits._
    val df = Seq(
      (1L, "The Cat, sat!"),
      (2L, "the   cat sat"),
      (3L, "THE CAT... SAT"),
      (4L, "an entirely different document")).toDF("doc_id", "text")
    val fps = TextOps.fingerprintFrame(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    assert(fps(1L) == fps(2L) && fps(2L) == fps(3L),
      "normalization variants must collide")
    assert(fps(4L) != fps(1L), "distinct content must not collide")
  }

  test("rolling-hash fingerprint kernel: O(n) windows match re-hashed windows") {
    import graft.functions.Kernels
    val text = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val w = 8
    val rolled = Kernels.rollingHashes(text, w)
    assert(rolled.length == text.length - w + 1)
    // shared substrings produce shared window hashes at the right offsets
    val other = "a very quick brown fox indeed".getBytes("UTF-8")
    val otherRolled = Kernels.rollingHashes(other, w).toSet
    val shared = rolled.count(otherRolled.contains)
    assert(shared >= 5, s"'quick brown fox' windows should collide (got $shared)")
    // disjoint content shares nothing
    val disjoint = Kernels.rollingHashes("0123456789012345".getBytes("UTF-8"), w).toSet
    assert(!rolled.exists(disjoint.contains))
    // edge: input shorter than window
    assert(Kernels.rollingHashes("abc".getBytes("UTF-8"), 8).isEmpty)
  }

  test("t02/t03 scores behave on the corpus (ranges and consistency)") {
    val q = TextOps.t02QualityScore(spark, TestSpark.sfTest).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val quality = r.getAs[Double]("quality")
      assert(quality >= 0.0 && quality <= 1.0, s"quality out of range: $quality")
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_words"))
    }
    val t = TextOps.t03TokenCount(spark, TestSpark.sfTest).collect()
    t.foreach { r =>
      // single-space lowercase corpus: regex tokens == whitespace tokens
      assert(r.getAs[Long]("re_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("t19 exact-substring dedup: verbatim copies flag, ownership goes to the smaller doc_id") {
    val out = TextOps.t19SubstringDedup(spark, TestSpark.sfTest).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup"))).toMap
    assert(out.nonEmpty)
    // the synthetic corpus carries exact duplicate documents; every
    // shared span must be billed to the LATER doc, never the owner —
    // so some docs are flagged, and the flagged set never includes a
    // doc that is the minimum of its duplicate group (owner of every
    // window it shares)
    val flagged = out.filter(_._2._2 > 0)
    assert(flagged.nonEmpty, "corpus duplicates should produce flagged docs")
    out.foreach { case (_, (nw, nd)) => assert(nd <= nw) }
    // a doc duplicated verbatim shares EVERY window with its owner
    assert(flagged.exists { case (_, (nw, nd)) => nd == nw },
      "a verbatim copy should have every window duplicated")
  }

  test("t20 DSIR weights discriminate the target domain") {
    // the discrimination property of importance weighting: docs FROM
    // the target distribution (lang='en') must score the highest
    // per-token log ratio on average — if they don't, the target/raw
    // bucket tables are swapped or the smoothing is broken
    val docs = graft.pipeline.docs(spark, TestSpark.sfTest)
      .select("doc_id", "lang")
    val byLang = TextOps.t20Dsir(spark, TestSpark.sfTest)
      .join(docs, "doc_id")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.col("logratio") /
          org.apache.spark.sql.functions.col("n_toks")).as("per_tok"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("per_tok")).toMap
    val others = byLang.filter(_._1 != "en").values
    assert(others.forall(_ < byLang("en")),
      s"target domain must outscore every other source: $byLang")
  }

  test("t29 heavy hitters: the MG candidate pass never loses a true top-k token") {
    val sp = spark
    import sp.implicits._
    // adversarially small capacity on a skewed synthetic corpus: heavy
    // tokens repeated 50+i times, plus 500 singletons fighting for the
    // m=32 counters — N=760, so the MG guarantee (keep every token with
    // freq > N/m = 23.75) covers exactly the heavies and nothing else
    def word(prefix: String, i: Int) = // letters only: the tokenizer is [a-z]+
      prefix + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val heavy = (0 until 5).flatMap(i => Seq.fill(50 + i)(word("heavy", i)))
    val noise = (0 until 500).map(i => word("noise", i))
    val corpus = scala.util.Random.shuffle(heavy ++ noise).zipWithIndex
      .map { case (w, i) => (i.toLong, w, "en", "synth", w.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("hh").toString
    corpus.write.parquet(tmp + "/documents.parquet")
    val got = graft.pipeline.TextOps.t29HeavyHitters(sp, tmp, m = 32, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (0 until 5).map(i => (word("heavy", i), (50 + i).toLong))
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq == want, s"got=${got.toSeq}")
  }
}
