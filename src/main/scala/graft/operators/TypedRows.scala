package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row decode surface — the Spark analog of the reference's
  * FromRow/FromField typeclass stack (reference: FromRow.hs:71-324),
  * which decodes int2/4/8, float4/8, numeric→Decimal, bytea, date/
  * timestamp and `Maybe a` into Haskell values.
  *
  * In graft the decode layer is the case-class `Encoder`: numeric →
  * `java.math.BigDecimal`, bytea → `Array[Byte]`, date →
  * `java.sql.Date`, `Maybe a` → `Option[A]`. The q25 query casts into
  * that shape, round-trips through the typed Dataset (a genuine
  * serialize/deserialize of every field, including a row-level typed
  * filter), then aggregates declaratively so Catalyst still owns the
  * plan. TypedSpec checks the encoder round-trip field by field.
  */
object TypedRows {

  /** One decoded order row — mirrors FromRow.hs's instance coverage:
    * int8 → Long, numeric → BigDecimal, date → java.sql.Date,
    * Maybe text → Option[String], bytea → Array[Byte].
    */
  case class OrderTyped(
      o_orderkey: Long,
      price: java.math.BigDecimal,
      d: java.sql.Date,
      prio: Option[String],
      key_bytes: Array[Byte])

  /** The typed dataset: parquet scan cast into the decoded shape.
    * `prio` is NULL for '3-MEDIUM' rows so the Option path carries
    * real Nones; `key_bytes` is a 16-byte bytea per row.
    */
  def typedOrders(s: SparkSession, dir: String): Dataset[OrderTyped] = {
    import s.implicits._
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"),
        col("o_orderdate").cast("date").as("d"),
        when(col("o_orderpriority") =!= "3-MEDIUM", col("o_orderpriority")).as("prio"),
        unhex(md5(col("o_orderkey").cast("string").cast("binary"))).as("key_bytes"))
      .as[OrderTyped]
  }

  /** q25: decode → typed round-trip → declarative aggregate. The typed
    * filter deserializes every field (the FromRow moment); it is
    * deliberately row-local so the per-row cost is bounded and the
    * subsequent groupBy stays a normal shuffle-with-partial-agg.
    */
  def q25TypedDecode(s: SparkSession, dir: String): DataFrame =
    typedOrders(s, dir)
      .filter(o => o.key_bytes.length == 16 && o.price.signum >= 0)
      .toDF()
      .groupBy(coalesce(col("prio"), lit("none")).as("prio"))
      .agg(
        count(lit(1)).as("n"),
        sum("price").as("sum_price"),
        min("d").as("min_date"),
        max("d").as("max_date"),
        sum(when(col("prio").isNull, 1L).otherwise(0L)).as("n_null"))
      .orderBy("prio")

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q25_typed_decode" -> q25TypedDecode _)

  val oracles: Map[String, String] = Map(
    "q25_typed_decode" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS price,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CASE WHEN o_orderpriority <> '3-MEDIUM' THEN o_orderpriority END AS prio
        |  FROM orders
        |)
        |SELECT coalesce(prio, 'none') AS prio, count(*) AS n,
        |  sum(price) AS sum_price, min(d) AS min_date, max(d) AS max_date,
        |  CAST(sum(CASE WHEN prio IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)
}
