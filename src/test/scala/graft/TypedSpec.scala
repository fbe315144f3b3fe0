package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TypedRows

/** Encoder round-trip for the typed decode surface (the FromRow analog):
  * numeric→BigDecimal, date→java.sql.Date, Maybe→Option, bytea→bytes.
  */
class TypedSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("OrderTyped encoder round-trips every field type") {
    val ds = TypedRows.typedOrders(spark, TestSpark.sfTest)
    val rows = ds.collect()
    assert(rows.nonEmpty)
    rows.take(100).foreach { o =>
      assert(o.price.scale == 2, s"decimal scale: ${o.price}")
      assert(o.key_bytes.length == 16, "md5 bytea must be 16 bytes")
      assert(o.d.toLocalDate.getYear >= 1990)
    }
    // Option path: 3-MEDIUM rows must decode as None, others as Some
    assert(rows.exists(_.prio.isEmpty), "expected Nones for 3-MEDIUM")
    assert(rows.exists(_.prio.isDefined))
    assert(rows.forall(o => o.prio.forall(_ != "3-MEDIUM")))
  }

  test("typed filter + aggregate pipeline (q25) is consistent with raw counts") {
    val out = TypedRows.q25TypedDecode(spark, TestSpark.sfTest).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    val nOrders = graft.operators.t(spark, TestSpark.sfTest, "orders").count()
    assert(total == nOrders, "typed filter must not drop rows (all pass the predicate)")
    val noneRow = out.find(_.getAs[String]("prio") == "none").get
    assert(noneRow.getAs[Long]("n_null") == noneRow.getAs[Long]("n"))
  }
}
