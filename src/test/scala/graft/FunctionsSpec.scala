package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kernels
import graft.functions.functions._

/** Unit checks for the custom Catalyst expressions: known values, the
  * MinHash estimator property, SimHash locality, LSH determinism — both
  * through the Column API (codegen path) and the SQL registration.
  */
class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def floats(xs: Float*) = array(xs.map(lit): _*).cast("array<float>")

  test("cosine_sim known values (Column API)") {
    val row = spark.range(1).select(
      cosine_sim(floats(1f, 0f), floats(0f, 1f)).as("orth"),
      cosine_sim(floats(1f, 2f, 3f), floats(1f, 2f, 3f)).as("self"),
      cosine_sim(floats(1f, 0f), floats(1f, 1f)).as("half")).head()
    assert(math.abs(row.getDouble(0)) < 1e-12)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - math.sqrt(0.5)) < 1e-12)
  }

  test("cosine_sim through SQL registration") {
    val v = spark.sql(
      "SELECT cosine_sim(array(3.0f, 4.0f), array(3.0f, 4.0f)) AS c").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("minhash signature equality rate estimates Jaccard") {
    // two 200-token sets sharing exactly 100 tokens: J = 100/300 = 1/3
    val a = (0 until 200).map(i => s"tok$i")
    val b = (100 until 300).map(i => s"tok$i")
    val df = spark.range(1).select(
      minhash_sig(array(a.map(lit): _*), 128).as("sa"),
      minhash_sig(array(b.map(lit): _*), 128).as("sb"))
    val est = df.select(
      expr("cast(size(filter(zip_with(sa, sb, (x, y) -> x = y), b -> b)) as double) / 128").as("est"))
      .head().getDouble(0)
    // sd of the estimator at k=128, j=1/3 is ~0.042; allow 4 sd
    assert(math.abs(est - 1.0 / 3.0) < 0.17, s"estimate $est too far from 1/3")
  }

  test("simhash locality: identical sets collide, disjoint sets are far") {
    val xs = (0 until 50).map(i => s"w$i")
    val ys = (100 until 150).map(i => s"v$i")
    val r = spark.range(1).select(
      simhash64(array(xs.map(lit): _*)).as("h1"),
      simhash64(array(xs.map(lit): _*)).as("h2"),
      simhash64(array(ys.map(lit): _*)).as("h3"))
      .selectExpr("bit_count(h1 ^ h2) AS same", "bit_count(h1 ^ h3) AS diff")
      .head()
    assert(r.getAs[Int]("same") == 0)
    assert(r.getAs[Int]("diff") > 10, "disjoint sets should differ in many bits")
  }

  test("lsh_bucket is deterministic and seed-sensitive") {
    val r = spark.range(1).select(
      lsh_bucket(floats(0.5f, -0.25f, 1f), 8, 7L).as("b1"),
      lsh_bucket(floats(0.5f, -0.25f, 1f), 8, 7L).as("b2")).head()
    assert(r.getInt(0) == r.getInt(1))
    // kernel-level: same vector, different seeds should not always agree
    val v = Array(0.5f, -0.25f, 1f, 0.1f, -0.7f)
    val buckets = (0 until 16).map(s => Kernels.lshBucket(v, 8, s.toLong)).toSet
    assert(buckets.size > 1, "bucket must depend on the seed")
  }

  test("vec_mean aggregate: correct mean across partitions (merge path)") {
    import graft.functions.VecMeanAgg.vec_mean
    import spark.implicits._
    val df = Seq(
      (0, Array(1f, 2f)), (0, Array(3f, 4f)), (0, Array(5f, 6f)),
      (1, Array(10f, 20f)))
      .toDF("g", "v").repartition(3) // force partial buffers + merge
    val got = df.groupBy("g").agg(vec_mean(col("v"), 2).as("m"))
      .orderBy("g").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(got(0) == Seq(3.0, 4.0))
    assert(got(1) == Seq(10.0, 20.0))
  }

  test("declared input types: double arrays coerce, non-arrays fail analysis") {
    // array<double> → analysis inserts a cast to array<float>, so a
    // double literal array produces the right answer instead of
    // misreading bytes via ArrayData.getFloat
    val v = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    // ints coerce too (int → float is an implicit widening cast)
    val w = spark.sql(
      "SELECT cosine_sim(array(1, 0), array(0, 1)) AS c").head().getDouble(0)
    assert(math.abs(w) < 1e-12)
    // a non-array argument must fail at ANALYSIS time, not executor-side
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim('abc', array(1.0f))").head()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"), err.getMessage)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(1, 2)").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64('not an array')").head()
    }
  }

  test("weighted_avg declarative aggregate: merge path, nulls, SQL surface") {
    import graft.functions.WeightedAvg.weighted_avg
    import spark.implicits._
    val df = Seq(
      (0, Some(10.0), 1.0), (0, Some(20.0), 3.0), (0, None, 100.0),
      (1, Some(5.0), 0.0))
      .toDF("g", "v", "w").repartition(3) // force partial buffers + merge
    val got = df.groupBy("g").agg(weighted_avg(col("v"), col("w")).as("wa"))
      .orderBy("g").collect()
    assert(got(0).getDouble(1) == (10.0 * 1 + 20.0 * 3) / 4.0, "null value rows must not count")
    assert(got(1).isNullAt(1), "zero total weight must yield null, not NaN")
    // SQL registration (and int→double coercion via declared input types)
    val viaSql = spark.sql("SELECT weighted_avg(v, w) FROM VALUES (1, 1), (3, 3) AS t(v, w)")
      .head().getDouble(0)
    assert(viaSql == 2.5, s"got $viaSql")
  }

  test("kernels match expression results (eval vs codegen parity)") {
    val a = Array(0.1f, 0.2f, 0.3f)
    val b = Array(-0.3f, 0.5f, 0.9f)
    val viaExpr = spark.range(1)
      .select(cosine_sim(floats(a: _*), floats(b: _*))).head().getDouble(0)
    assert(viaExpr == Kernels.cosine(a, b))
  }
}
