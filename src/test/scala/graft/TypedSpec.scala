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

  test("OrderWide (q31) decodes uuid/char/money/interval/time/Maybe/nested per row") {
    val rows = TypedRows.typedOrderWide(spark, TestSpark.sfTest).collect()
    assert(rows.nonEmpty)
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    rows.take(200).foreach { o =>
      assert(uuidRe.matches(o.uid), s"uuid shape: ${o.uid}")
      // the canonical string must parse as a real UUID
      assert(java.util.UUID.fromString(o.uid).toString == o.uid)
      assert(o.status_char.length == 1, s"char(1): ${o.status_char}")
      assert(o.money.scale == 4, s"money scale: ${o.money}")
      assert(!o.span.isNegative && o.span.compareTo(java.time.Duration.ofDays(3650)) < 0)
      // otime was built as (1 + key%23, key*7%60, key*13%60)
      assert(o.otime == java.time.LocalTime.of(
        (1 + o.o_orderkey % 23).toInt, (o.o_orderkey * 7 % 60).toInt, (o.o_orderkey * 13 % 60).toInt),
        s"time decode: ${o.otime} for key ${o.o_orderkey}")
      // timetz analog: the zone offset rides next to the time, typed
      assert(o.otz_min == ((o.o_orderkey % 27) * 30 - 360).toInt,
        s"tz offset decode: ${o.otz_min} for key ${o.o_orderkey}")
      // year-month interval decodes as Period with the right total months
      assert(o.age.toTotalMonths == (o.o_orderkey % 3) * 12 + (o.o_orderkey % 12),
        s"ym interval decode: ${o.age} for key ${o.o_orderkey}")
      // nested array-of-struct: sorted by ln, decimal qty scale preserved
      assert(o.items.nonEmpty)
      assert(o.items.map(_.ln) == o.items.map(_.ln).sorted, "items must be ln-sorted")
      assert(o.items.forall(_.qty.scale == 2))
    }
    // Maybe path: 'P' orders decode as None
    assert(rows.exists(_.clerk_id.isEmpty), "expected Nones for status P")
    assert(rows.exists(_.clerk_id.isDefined))
  }

  test("Duration/Period/LocalTime encoders round-trip exactly (in-memory)") {
    val sp = spark
    import sp.implicits._
    val d = java.time.Duration.ofDays(3).plusHours(7).plusSeconds(11)
    val p = java.time.Period.ofMonths(26)
    val lt = java.time.LocalTime.of(23, 59, 58)
    val got = Seq((d, p, lt)).toDS().collect().head
    assert(got._1 == d && got._3 == lt, s"interval/time round-trip mismatch: $got")
    // YearMonthIntervalType stores total months; Period comes back
    // normalized (26 months → P2Y2M), so compare totals not fields
    assert(got._2.toTotalMonths == p.toTotalMonths, s"period total months: ${got._2}")
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
