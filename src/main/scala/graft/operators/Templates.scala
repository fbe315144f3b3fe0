package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sql.{Identifier, Query, SqlFrag, ToField}
import graft.sources.Catalog

/** A1 `q17_sql_template`: the quasiquoter + splice path end-to-end
  * (reference: QueryBuilder.hs:153-187, Example.hs:22-56). The template
  * carries `{n}` placeholders filled by `ToField` renderings — epoch
  * ints into TO_TIMESTAMP-style conversions, a quoted string, a raw
  * `Identifier` table splice and a raw `SqlFrag` LIMIT splice — then
  * runs through `spark.sql`, so Catalyst plans the *expanded* query
  * (pushdown etc.), exactly like Postgres planned the reference's
  * formatted bytestring.
  */
object Templates {

  val sample: Query = Query(
    """SELECT o_orderkey,
      |  CAST(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS day,
      |  o_totalprice
      |FROM {4}
      |WHERE o_orderdate BETWEEN timestamp_seconds({1}) AND timestamp_seconds({2})
      |  AND o_orderstatus = {3}
      |ORDER BY o_orderkey
      |{5}""".stripMargin)

  def q17Template(s: SparkSession, dir: String): DataFrame = {
    Catalog.register(s, dir)
    val rendered = Seq(
      ToField.longField.render(820454400L),        // 1996-01-01T00:00:00Z
      ToField.longField.render(852076800L),        // 1997-01-01T00:00:00Z
      ToField.stringField.render("F"),
      ToField.identifierField.render(Identifier("orders")),
      ToField.fragField.render(SqlFrag("LIMIT 500")))
    sample.run(s, rendered)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q17_sql_template" -> q17Template _)

  val oracles: Map[String, String] = Map(
    "q17_sql_template" ->
      """SELECT o_orderkey,
        |  CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS day,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-01-01'
        |  AND o_orderstatus = 'F'
        |ORDER BY o_orderkey
        |LIMIT 500""".stripMargin)
}
