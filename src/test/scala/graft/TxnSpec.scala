package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots

/** The transaction guarantees of the snapshot commit log (the
  * reference's withTransaction analog): multi-table atomicity,
  * snapshot isolation for readers, crash safety for writers that die
  * before publishing, optimistic-concurrency version claims, and time
  * travel.
  */
class TxnSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def df(pairs: (Long, Double)*) = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("id", "v")
  }

  test("multi-table commit is atomic and snapshot reads never mix versions") {
    val root = Files.createTempDirectory("txn").toString + "/t"
    val snap = new Snapshots(spark, root)
    assert(snap.currentVersion.isEmpty)

    val v1 = snap.commit(Map("a" -> df(1L -> 1.0), "b" -> df(1L -> 10.0)))
    assert(v1 == 1L && snap.currentVersion.contains(1L))

    // resolve a snapshot, then land a new commit UNDER the reader:
    // the already-resolved snapshot must keep reading version 1 of
    // BOTH tables (isolation), while new resolutions see version 2
    val reader = snap.snapshot()
    val v2 = snap.commit(Map("a" -> df(2L -> 2.0), "b" -> df(2L -> 20.0)))
    assert(v2 == 2L)
    assert(reader("a").select("id").head().getLong(0) == 1L)
    assert(reader("b").select("id").head().getLong(0) == 1L)
    val fresh = snap.snapshot()
    assert(fresh("a").select("id").head().getLong(0) == 2L)
    assert(fresh("b").select("id").head().getLong(0) == 2L)

    // time travel: version 1 stays readable
    assert(snap.read("b", Some(1L)).select("v").head().getDouble(0) == 10.0)
  }

  test("a writer crashing before the manifest leaves no visible state") {
    val root = Files.createTempDirectory("txn").toString + "/t"
    val snap = new Snapshots(spark, root)
    snap.commit(Map("a" -> df(1L -> 1.0)))
    // simulate the crash: data files for v2 written, manifest never
    // published (exactly what a mid-commit executor/driver death leaves)
    df(99L -> 99.0).write.parquet(s"$root/v2/a")
    assert(snap.currentVersion.contains(1L), "orphan data must stay invisible")
    assert(snap.read("a").select("id").head().getLong(0) == 1L)
    // the next commit claims a fresh version and wins cleanly
    val v = snap.commit(Map("a" -> df(2L -> 2.0)))
    assert(v >= 2L && snap.read("a").select("id").head().getLong(0) == 2L)
  }

  test("optimistic concurrency: losing a version race retries and both commits land") {
    val root = Files.createTempDirectory("txn").toString + "/t"
    val s1 = new Snapshots(spark, root)
    val s2 = new Snapshots(spark, root)
    s1.commit(Map("a" -> df(1L -> 1.0)))
    // both sessions believe current = 1 and will try to claim v2; the
    // create-exclusive manifest write serializes them
    val r1 = s1.commit(Map("a" -> df(2L -> 2.0)))
    val r2 = s2.commit(Map("a" -> df(3L -> 3.0)))
    assert(Set(r1, r2) == Set(2L, 3L), s"got versions $r1, $r2")
    assert(new Snapshots(spark, root).read("a").select("id").head().getLong(0) == 3L)
  }

  test("schema evolution: each snapshot version keeps its own schema") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("txn").toString + "/t"
    val snap = new Snapshots(spark, root)
    snap.commit(Map("a" -> Seq((1L, 1.0)).toDF("id", "v")))
    // v2 adds a column — committed data files are immutable per
    // version, so old readers keep the old shape, new readers the new
    snap.commit(Map("a" -> Seq((2L, 2.0, "x")).toDF("id", "v", "tag")))
    assert(snap.read("a", Some(1L)).columns.toSeq == Seq("id", "v"))
    assert(snap.read("a").columns.toSeq == Seq("id", "v", "tag"))
    assert(snap.read("a").head().getString(2) == "x")
  }

  test("rollbackTo re-points head at an old snapshot; history stays time-travelable") {
    val root = Files.createTempDirectory("txn").toString + "/t"
    val snap = new Snapshots(spark, root)
    snap.commit(Map("a" -> df(1L -> 1.0), "b" -> df(1L -> 10.0)))
    snap.commit(Map("a" -> df(2L -> 2.0), "b" -> df(2L -> 20.0)))

    val v3 = snap.rollbackTo(1L)
    assert(v3 == 3L, "rollback publishes a NEW head version")
    // head state == version 1's state, for every table in the commit
    val cur = snap.snapshot()
    assert(cur("a").select("id").head().getLong(0) == 1L)
    assert(cur("b").select("v").head().getDouble(0) == 10.0)
    // the rolled-back version is not erased — time travel still reads it
    assert(snap.read("a", Some(2L)).select("id").head().getLong(0) == 2L)
    // and committing after a rollback moves forward normally
    val v4 = snap.commit(Map("a" -> df(4L -> 4.0), "b" -> df(4L -> 40.0)))
    assert(v4 == 4L && snap.read("a").select("id").head().getLong(0) == 4L)
    // rolling back to a never-committed version must fail loudly
    intercept[Exception](snap.rollbackTo(99L))
  }

  test("c04 snapshot key: detail and summary agree within one snapshot") {
    val out = Snapshots.c04SnapshotRead(spark, TestSpark.sfTest).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_detail") == r.getAs[Long]("n"),
        "detail/summary row counts diverge — torn snapshot")
      assert(r.getAs[Double]("total_detail") == r.getAs[Double]("total"),
        "detail/summary totals diverge — torn snapshot")
    }
  }
}
