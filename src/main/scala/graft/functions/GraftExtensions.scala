package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the custom expressions via the public
  * SparkSessionExtensions hook (`spark.sql.extensions=graft.functions.
  * GraftExtensions`, set by GraftSession) — `spark.sql("cosine_sim(…)")`
  * and the QueryBuilder template path see the same functions the Column
  * API exposes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "built-in")

    // whole-operator extension: top-k-per-group logical node → bounded
    // heap physical operator (graft.plans.TopKPerGroup)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.ShinglePairsStrategy)

    // SQL catalog reads: GraftCatalog relations → the engine's v1
    // manifest-planned scan (see graft.sources.GraftLakeReads)
    ext.injectResolutionRule(session => graft.sources.GraftLakeReads(session))

    // SQL UPDATE / MERGE INTO on lake tables → the Snapshots verbs
    // (post-hoc: the commands must be fully resolved first)
    ext.injectPostHocResolutionRule(session => graft.sources.GraftDmlCommands(session))

    // CREATE/DROP VIEW on graft catalogs → the engine's view commands
    // (the Iceberg injected-parser route: Spark's analyzer has no v2
    // view resolution; see graft.sources.GraftViews)
    ext.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens, k) - k-permutation MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args(0), litInt(args(1), "k"))))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token set"),
      (args: Seq[Expression]) => SimHash64(args(0))))

    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted long arrays"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(vec, nbits, seed) - random-hyperplane LSH bucket"),
      (args: Seq[Expression]) =>
        LshBucket(args(0), litInt(args(1), "nbits"), litLong(args(2), "seed"))))

    ext.injectFunction((FunctionIdentifier("weighted_avg"),
      info("weighted_avg", "weighted_avg(value, weight) - sum(v*w)/sum(w) declarative aggregate"),
      (args: Seq[Expression]) => WeightedAvg(args(0), args(1)).toAggregateExpression()))

    // TEXT-PIPELINE scalars as SQL — the curation heuristics (t01-t04)
    // each as one registered function, so `SELECT … WHERE
    // quality_score(text) >= 0.5 AND lang_id(text) = 'en'` is pure
    // text. Each builds the SAME Column expression the Scala operators
    // use (TextOps.*Col — builtins only, whole-stage codegen, pushable)
    // through the public Column↔Expression converters; no parallel
    // derivation to drift.
    def colFn(name: String, usage: String)(
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name(text) takes exactly one argument")
          org.apache.spark.sql.GraftShim.columnExpression(
            f(org.apache.spark.sql.GraftShim.column(args.head)))
        }))

    colFn("lang_id",
      "lang_id(text) - stopword-evidence language tag (en/de/fr/es/und)")(
      graft.pipeline.TextOps.langIdCol)
    colFn("quality_score",
      "quality_score(text) - linear blend of diversity/stopword/length heuristics in [0,1]")(
      graft.pipeline.TextOps.qualityScoreCol)
    colFn("token_count",
      "token_count(text) - whitespace token count")(
      graft.pipeline.TextOps.tokenCountCol)
    colFn("doc_fingerprint",
      "doc_fingerprint(text) - md5 of case/punctuation/whitespace-normalized text")(
      graft.pipeline.TextOps.fingerprintCol)
  }
}
