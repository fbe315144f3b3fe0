package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Sketches}

/** Accuracy bounds for the sketch aggregations vs their exact twins. */
class SketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sfTest

  test("q27 HLL distinct counts within 5% of exact") {
    val approx = Sketches.q27ApproxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.q10Distinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("q33_profile_approx: estimates within rsd of the exact profile, Expand gone from the plan") {
    import graft.operators.Profiling
    val approxDf = Profiling.q33ProfileApprox(spark, dir)
    val exactDf = Profiling.q33Profile(spark, dir)
    // r13: the exact profile itself no longer plans an Expand (each
    // distinct is its own two-phase aggregate); the r12 Expand form is
    // kept as the reference — it must still Expand, the shipped forms
    // must not, and the shipped exact form must match it row-for-row.
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Expand")
    assert(hasExpand(Profiling.q33ProfileExpand(spark, dir)),
      "fixture drift: the multi-distinct single-aggregate form should plan an Expand")
    assert(!hasExpand(exactDf), "the exact profile must no longer plan an Expand")
    assert(!hasExpand(approxDf), "the approx profile must not plan an Expand")
    assert(exactDf.collect().toSeq == Profiling.q33ProfileExpand(spark, dir).collect().toSeq,
      "no-Expand exact profile must be row-identical to the Expand form")

    val approx = approxDf.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val exact = exactDf.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (n, nn, nd, mn, mx, av)) =>
      val (an, ann, and, amn, amx, aav) = approx(c)
      // everything except n_distinct is the SAME aggregate — exact
      assert((an, ann, amn, amx, aav) == ((n, nn, mn, mx, av)), s"$c non-distinct stats differ")
      // n_distinct within HLL++ accuracy (rsd 0.02; 2.5 sigma margin)
      assert(math.abs(and - nd).toDouble / nd <= 0.05,
        s"$c: approx n_distinct $and vs exact $nd")
    }
  }

  test("q28 approx percentiles within 2% of exact") {
    val approx = Sketches.q28ApproxPercentile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Relational.q23Percentile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap // p50
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) / ex <= 0.02, s"$k: approx p50 $ap vs exact $ex")
    }
  }
}
