package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Ann

/** The Lloyd-iteration property: the clustering objective (mean cosine
  * distance to the assigned centroid) must not increase across
  * refinement iterations — the end-to-end proof that assignment
  * (broadcast argmin) and update (vec_mean aggregate) compose
  * correctly.
  */
class KmeansSpec extends AnyFunSuite {

  test("k-means refinement monotonically improves the objective") {
    val hist = Ann.kmeansRefine(TestSpark.spark, TestSpark.sfTest, nlist = 8, iters = 3)
    info(s"objective per iteration: $hist")
    assert(hist.size == 3)
    hist.sliding(2).foreach { case Seq((_, prev), (_, next)) =>
      assert(next <= prev + 1e-9, s"objective rose: $prev -> $next")
    }
    assert(hist.last._2 < hist.head._2, "refinement should strictly improve on random-seeded centroids")
  }
}
