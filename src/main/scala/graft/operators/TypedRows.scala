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

  // ---------------------------------------------------------------- q31

  /** One order line as a nested composite — the FromRow "row inside a
    * row" analog (reference FromRow.hs decodes composite fields through
    * the same typeclass stack).
    */
  case class Item(ln: Int, qty: java.math.BigDecimal)

  /** The wide decode surface (reference: FromRow.hs:71-324): uuid
    * (canonical 8-4-4-4-12 string), char, money → Decimal(19,4),
    * interval day-time → java.time.Duration, time → java.time.LocalTime,
    * timetz → (LocalTime, zone-offset minutes) pair (Spark has no
    * zoned-time type; the offset lands typed next to the time, which is
    * exactly the (time, offset) pair Postgres puts on the wire),
    * interval year-month → java.time.Period, Maybe int8 → Option[Long],
    * and a nested array-of-struct.
    */
  case class OrderWide(
      o_orderkey: Long,
      uid: String,
      status_char: String,
      money: java.math.BigDecimal,
      span: java.time.Duration,
      otime: java.time.LocalTime,
      otz_min: Int,
      age: java.time.Period,
      clerk_id: Option[Long],
      items: Seq[Item])

  /** Typed wide dataset: one row per order with its lineitems nested as
    * an array-of-struct. collect_list is order-nondeterministic, so the
    * struct array is array_sort'ed (sorts on the leading `ln` field) —
    * deterministic nested payloads under any shuffle.
    */
  def typedOrderWide(s: SparkSession, dir: String): Dataset[OrderWide] = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(
        array_sort(collect_list(struct(
          col("l_linenumber").cast("int").as("ln"),
          col("l_quantity").cast("decimal(12,2)").as("qty")))).as("items"),
        datediff(max(col("l_shipdate")).cast("date"), min(col("l_shipdate")).cast("date"))
          .as("span_days"))
    val h = md5(col("o_orderkey").cast("string"))
    t(s, dir, "orders")
      .join(li, Seq("o_orderkey"))
      .select(
        col("o_orderkey"),
        concat_ws("-",
          substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
          substring(h, 17, 4), substring(h, 21, 12)).as("uid"),
        substring(col("o_orderstatus"), 1, 1).as("status_char"),
        col("o_totalprice").cast("decimal(19,4)").as("money"),
        expr("make_dt_interval(span_days, 0, 0, 0)").as("span"),
        // hour = 1 + key % 23, so the per-group min TIME actually varies
        // (a % 24 hour collapses every group's min to ~00:00:xx)
        expr("make_time(cast(1 + o_orderkey % 23 as int), cast(o_orderkey * 7 % 60 as int), " +
          "cast(o_orderkey * 13 % 60 as decimal(16,6)))").as("otime"),
        // timetz analog: zone offset in minutes, -360..+420 in 30-min steps
        expr("cast((o_orderkey % 27) * 30 - 360 as int)").as("otz_min"),
        // year-month interval (reference decodes full Postgres interval
        // including the months word; day-time lives in `span` above)
        expr("make_ym_interval(cast(o_orderkey % 3 as int), cast(o_orderkey % 12 as int))")
          .as("age"),
        when(col("o_orderstatus") =!= "P", col("o_custkey")).as("clerk_id"),
        col("items"))
      .as[OrderWide]
  }

  /** q31: the wide FromRow surface end-to-end — decode to
    * [[OrderWide]], round-trip through the typed Dataset (the filter
    * deserializes every field including the nested items and the
    * interval/time values), then aggregate declaratively. Every exotic
    * type lands in the output where DuckDB can reproduce it: the
    * day-time interval via extract(DAY), the year-month interval as
    * total months, the time via min(TIME) then CANONICALIZED to an
    * 'HH:mm:ss' string + seconds-since-midnight long (raw engine TIME
    * values cross the cross-engine compare as engine-specific objects —
    * round 3's one red key; the TIME round-trip itself is TypedSpec's
    * job), the timetz pair as UTC-normalized seconds, the uuid via
    * min(string), the nested array via its size/qty rollups.
    *
    * Round-5 rule, learned the hard way: EVERY column that crosses the
    * cross-engine hash compare is BIGINT or VARCHAR — no DECIMAL (Spark
    * sums Decimal(19,4) to (29,4), DuckDB to (38,4); readers repr those
    * differently), no DOUBLE (accumulation order diverges). Money and
    * qty land as exact integer cents/hundredths.
    */
  def q31TypedWide(s: SparkSession, dir: String): DataFrame =
    typedOrderWide(s, dir)
      .filter(o => o.uid.length == 36 && o.items.nonEmpty &&
        !o.span.isNegative && o.money.signum >= 0 &&
        o.age.toTotalMonths >= 0 && o.otz_min >= -720)
      .toDF()
      // portable per-row projections of the exotic types (min/max over
      // these longs ≡ min/max over the underlying values)
      .withColumn("otime_s",
        expr("hour(otime) * 3600L + minute(otime) * 60L + cast(second(otime) as bigint)"))
      .withColumn("utc_s", expr("pmod(otime_s - otz_min * 60L, 86400L)"))
      .withColumn("age_months",
        expr("extract(YEAR FROM age) * 12 + extract(MONTH FROM age)").cast("long"))
      .groupBy(col("status_char"))
      .agg(
        count(lit(1)).as("n"),
        // money crosses the engine compare as exact BIGINT cents·100:
        // Decimal(19,4) × 10⁴ is integral by construction, and a BIGINT
        // materializes identically in every reader. (Shipping the decimal
        // itself failed two rounds running: Spark sums to DECIMAL(29,4),
        // DuckDB to DECIMAL(38,4), and readers repr them differently.)
        (sum(col("money")) * 10000).cast("long").as("sum_money"),
        min("uid").as("min_uid"),
        max(expr("extract(DAY FROM span)")).cast("long").as("max_span_days"),
        sum(size(col("items"))).cast("long").as("total_items"),
        // qty likewise: exact per-item Decimal(12,2) × 100 → BIGINT
        // hundredths, folded in integer space (no double accumulation
        // order to diverge across engines)
        sum(aggregate(col("items"), lit(0L),
          (acc, x) => acc + (x.getField("qty") * 100).cast("long"))).as("sum_qty"),
        sum(when(col("clerk_id").isNull, 1L).otherwise(0L)).as("n_null_clerk"),
        min("otime").cast("string").as("min_time"),
        // SUMS, not mins/maxes: a min over thousands of rows of a
        // quasi-uniform derived value converges to the same constant in
        // any engine and would verify nothing — a sum flips on any
        // single mis-decoded row
        sum(col("otime_s")).as("sum_time_s"),
        sum(col("utc_s")).as("sum_utc_s"),
        sum(col("age_months")).as("sum_age_months"))
      .orderBy("status_char")

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q25_typed_decode" -> q25TypedDecode _,
      "q31_typed_wide" -> q31TypedWide _)

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
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_typed_wide" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    count(*) AS n_items,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS qty_cents,
        |    date_diff('day', CAST(min(l_shipdate) AS DATE), CAST(max(l_shipdate) AS DATE)) AS span_days
        |  FROM lineitem GROUP BY 1
        |), o AS (
        |  SELECT o_orderkey,
        |    substr(o_orderstatus, 1, 1) AS status_char,
        |    CAST(o_totalprice AS DECIMAL(19,4)) AS money,
        |    md5(CAST(o_orderkey AS VARCHAR)) AS h,
        |    CASE WHEN o_orderstatus <> 'P' THEN o_custkey END AS clerk_id,
        |    (1 + o_orderkey % 23) * 3600 + (o_orderkey * 7 % 60) * 60 + (o_orderkey * 13 % 60) AS otime_s,
        |    (o_orderkey % 27) * 30 - 360 AS tz_min,
        |    (o_orderkey % 3) * 12 + (o_orderkey % 12) AS age_months
        |  FROM orders
        |)
        |SELECT status_char, count(*) AS n,
        |  CAST(sum(money) * 10000 AS BIGINT) AS sum_money,
        |  min(concat(substr(h,1,8),'-',substr(h,9,4),'-',substr(h,13,4),'-',substr(h,17,4),'-',substr(h,21,12))) AS min_uid,
        |  CAST(max(span_days) AS BIGINT) AS max_span_days,
        |  CAST(sum(n_items) AS BIGINT) AS total_items,
        |  CAST(sum(qty_cents) AS BIGINT) AS sum_qty,
        |  CAST(sum(CASE WHEN clerk_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_clerk,
        |  CAST(make_time(min(otime_s) // 3600, (min(otime_s) % 3600) // 60,
        |                 CAST(min(otime_s) % 60 AS DOUBLE)) AS VARCHAR) AS min_time,
        |  CAST(sum(otime_s) AS BIGINT) AS sum_time_s,
        |  CAST(sum(((otime_s - tz_min * 60) % 86400 + 86400) % 86400) AS BIGINT) AS sum_utc_s,
        |  CAST(sum(age_months) AS BIGINT) AS sum_age_months
        |FROM o JOIN li ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
