package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Clusters

/** Connected-components (d07) invariants: exact components on known
  * graphs, including the chain shape that defeats single-round label
  * propagation, plus the operator-level output contract.
  */
class ClustersSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sfTest

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    Clusters.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph collapses to its minimum (pointer jumping works)") {
    // a 16-node path labeled in DESCENDING order: naive edge propagation
    // moves the min one hop per round; pointer jumping must close it
    // well inside the round budget.
    val chain = (0L until 15L).map(i => (15L - i, 14L - i))
    val cc = components(chain)
    assert(cc.keySet == (0L to 15L).toSet)
    assert(cc.values.toSet == Set(0L), s"chain did not collapse: $cc")
  }

  test("cycle and barbell graphs collapse to their minima") {
    // a cycle propagates the min in both directions simultaneously
    val cycle = (0L until 12L).map(i => (i, (i + 1) % 12))
    assert(components(cycle).values.toSet == Set(0L))
    // two cycles bridged by one edge — the bridge must merge them
    val barbell = cycle ++ (20L until 32L).map(i => (i, if (i == 31L) 20L else i + 1)) ++ Seq((5L, 25L))
    val cc = components(barbell)
    assert(cc.values.toSet == Set(0L), s"bridged cycles did not merge: $cc")
  }

  test("separate components stay separate; isolated vertices are absent") {
    val cc = components(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)))
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L) // self-loop keeps the vertex, alone
    assert(!cc.contains(5L))
  }

  test("d07 output: every doc clustered with its exact copy, sizes consistent") {
    val rows = Clusters.d07DedupClusters(spark, dir).collect()
    val byDoc = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the exact-pair edges guarantee i and i+100000 share a cluster
    byDoc.keys.filter(_ < 100000L).foreach { i =>
      assert(byDoc(i)._1 == byDoc(i + 100000L)._1, s"doc $i split from its copy")
    }
    // cluster_id is the min member, and cluster_size counts its members
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid, s"cluster $cid not labeled by min")
      assert(members.forall(_.getLong(2) == members.size), s"cluster $cid size mismatch")
    }
    // near-dup pairs must merge beyond the trivial {i, i'} twosomes
    assert(byCluster.exists(_._2.size >= 4), "no merged (>=4 doc) cluster found")
  }

  test("incremental components equal a full recompute on merge, bridge, and pass-through shapes") {
    val sp = spark
    import sp.implicits._
    // standing graph: {1,2} {3,4} {10,11,12} {20,21}
    val oldEdges = Seq((1L, 2L), (3L, 4L), (10L, 11L), (11L, 12L), (20L, 21L))
    val cc = Clusters.connectedComponents(oldEdges.toDF("a_id", "b_id"))
    // batch: bridge the first two clusters AND chain {10..} into {3,4}
    // via two hops; {20,21} must pass through untouched
    val batch = Seq((2L, 3L), (4L, 10L))
    val inc = Clusters.incrementalComponents(cc, batch.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Clusters.connectedComponents((oldEdges ++ batch.map { case (u, v) => (u, v) })
        .toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc(12L) == 1L, "transitive merge across the batch must reach label 1")
    assert(inc(21L) == 20L, "untouched component must keep its label")
  }
}
