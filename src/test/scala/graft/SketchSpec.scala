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
