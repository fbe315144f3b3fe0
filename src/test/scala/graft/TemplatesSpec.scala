package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{Identifier, Query, SqlFrag, ToField}

/** The splice layer's rendering contract (reference: QueryBuilder.hs
  * ToField instances + the {n} placeholder format): values quote and
  * escape, raw splices stay raw, options render NULL, and a spliced
  * UUID round-trips through spark.sql as a literal.
  */
class TemplatesSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("ToField renders: quoting, escaping, raw splices, Option, UUID") {
    assert(ToField.intField.render(42) == "42")
    assert(ToField.stringField.render("it's") == "'it''s'")
    assert(ToField.identifierField.render(Identifier("orders")) == "orders")
    assert(ToField.fragField.render(SqlFrag("LIMIT 5")) == "LIMIT 5")
    assert(ToField.optionField[String].render(None) == "null")
    assert(ToField.optionField[Long].render(Some(7L)) == "7")
    val u = java.util.UUID.fromString("123e4567-e89b-12d3-a456-426614174000")
    assert(ToField.uuidField.render(u) == "'123e4567-e89b-12d3-a456-426614174000'")
    assert(ToField.charField.render('\'') == "''''")
    assert(ToField.bigIntField.render(BigInt("98765432109876543210")) ==
      "98765432109876543210")
    assert(ToField.bytesField.render(Array[Byte](0x0a, -1)) == "X'0AFF'")
  }

  test("a spliced binary literal survives the spark.sql round trip") {
    val bytes = Array[Byte](0x0a, 0x5f, -76)
    val row = Query("SELECT {1} AS payload").run1(spark, bytes).head()
    assert(row.getAs[Array[Byte]](0).toSeq == bytes.toSeq)
  }

  test("a spliced UUID literal survives the spark.sql round trip") {
    val u = java.util.UUID.fromString("123e4567-e89b-12d3-a456-426614174000")
    val q = Query("SELECT {1} AS id, {2} AS tag")
    val row = q.run2(spark, u, Option.empty[String]).head()
    assert(row.getString(0) == u.toString)
    assert(row.isNullAt(1))
  }

  test("positional placeholders fill independently of argument order in the template") {
    val q = Query("SELECT {2} AS b, {1} AS a")
    val row = q.run2(spark, 1L, 2L).head()
    assert(row.getAs[Number](0).longValue == 2L && row.getAs[Number](1).longValue == 1L)
  }
}
