package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parameterized SQL templates — the Spark analog of the reference's
  * quasiquoter + splice layer
  * (reference: src/Database/PostgreSQL/Stream/QueryBuilder.hs:153-187).
  *
  * The reference renders `{1}`, `{2}`, ... placeholders in a SQL
  * bytestring from `ToField` instances (ints/floats verbatim,
  * strings/uuids quoted, identifiers and SQL fragments spliced raw,
  * `Nothing`→NULL). We keep the exact same template syntax and
  * typeclass shape, but the rendered SQL is handed to `spark.sql`, so
  * Catalyst sees one declarative plan (pushdown, pruning, join
  * reorder) instead of a prepared statement.
  */

/** SQL literal rendering for splice arguments
  * (reference: QueryBuilder.hs:40-101 `ToField`).
  */
trait ToField[-A] { def render(a: A): String }

object ToField {
  private def quote(s: String): String = "'" + s.replace("'", "''") + "'"

  implicit val intField: ToField[Int] = (a: Int) => a.toString
  implicit val longField: ToField[Long] = (a: Long) => a.toString
  implicit val floatField: ToField[Float] = (a: Float) => a.toString
  implicit val doubleField: ToField[Double] = (a: Double) => a.toString
  implicit val boolField: ToField[Boolean] = (a: Boolean) => a.toString
  implicit val stringField: ToField[String] = (a: String) => quote(a)
  // quoted like the reference's dedicated instance (QueryBuilder.hs:82);
  // UUID.toString is RFC-4122 lowercase hex, no quoting hazards
  implicit val uuidField: ToField[java.util.UUID] = (a: java.util.UUID) => quote(a.toString)
  // the remaining reference instances (QueryBuilder.hs:43-99): Char
  // quotes like a 1-char string, Integer splices unbounded, ByteString
  // renders as a SQL hex binary literal (X'…' — the Spark SQL form of
  // Postgres's E'\\x…')
  implicit val charField: ToField[Char] = (a: Char) => quote(a.toString)
  implicit val bigIntField: ToField[BigInt] = (a: BigInt) => a.toString
  implicit val bytesField: ToField[Array[Byte]] = (a: Array[Byte]) =>
    "X'" + a.map(b => f"${b & 0xff}%02X").mkString + "'"
  implicit val identifierField: ToField[Identifier] = (a: Identifier) => a.name
  implicit val fragField: ToField[SqlFrag] = (a: SqlFrag) => a.sql
  implicit val queryField: ToField[Query] = (a: Query) => a.template
  implicit def optionField[A](implicit f: ToField[A]): ToField[Option[A]] = {
    case Some(a) => f.render(a)
    case None    => "null"
  }
}

/** Raw identifier splice (table/column name) — unquoted, like the
  * reference's `Identifier` (reference: Types.hs:42).
  */
final case class Identifier(name: String)

/** Raw SQL fragment splice (e.g. "LIMIT 100000"), like the reference's
  * `SQL` newtype (reference: Types.hs:33, Example.hs:55).
  */
final case class SqlFrag(sql: String)

/** A SQL template with `{1}`-style positional placeholders
  * (reference: Types.hs:56 `Query`).
  */
final case class Query(template: String) {

  /** Substitute already-rendered argument strings positionally. */
  def formatRendered(rendered: Seq[String]): String =
    rendered.zipWithIndex.foldLeft(template) { case (acc, (r, i)) =>
      acc.replace("{" + (i + 1) + "}", r)
    }

  def format1[A: ToField](a: A): String =
    formatRendered(Seq(implicitly[ToField[A]].render(a)))

  def format2[A: ToField, B: ToField](a: A, b: B): String =
    formatRendered(Seq(
      implicitly[ToField[A]].render(a),
      implicitly[ToField[B]].render(b)))

  def format3[A: ToField, B: ToField, C: ToField](a: A, b: B, c: C): String =
    formatRendered(Seq(
      implicitly[ToField[A]].render(a),
      implicitly[ToField[B]].render(b),
      implicitly[ToField[C]].render(c)))

  def format4[A: ToField, B: ToField, C: ToField, D: ToField](
      a: A, b: B, c: C, d: D): String =
    formatRendered(Seq(
      implicitly[ToField[A]].render(a),
      implicitly[ToField[B]].render(b),
      implicitly[ToField[C]].render(c),
      implicitly[ToField[D]].render(d)))

  /** Run the formatted query through Catalyst — the analog of
    * `query conn q args` (reference: Stream.hs:92), except the result
    * is a distributed DataFrame, not a driver-side list.
    */
  def run(spark: SparkSession, rendered: Seq[String] = Nil): DataFrame =
    spark.sql(formatRendered(rendered))

  /** Typed splice-and-run forms — `query conn q (a, b)` in one call. */
  def run1[A: ToField](spark: SparkSession, a: A): DataFrame =
    spark.sql(format1(a))
  def run2[A: ToField, B: ToField](spark: SparkSession, a: A, b: B): DataFrame =
    spark.sql(format2(a, b))
  def run3[A: ToField, B: ToField, C: ToField](spark: SparkSession, a: A, b: B, c: C): DataFrame =
    spark.sql(format3(a, b, c))
  def run4[A: ToField, B: ToField, C: ToField, D: ToField](
      spark: SparkSession, a: A, b: B, c: C, d: D): DataFrame =
    spark.sql(format4(a, b, c, d))
}

object Query {
  /** `sql"SELECT ... {1}"` convenience, mirroring `[sql| ... |]`. */
  implicit class SqlInterpolator(private val sc: StringContext) extends AnyVal {
    def sql(args: Any*): Query = Query(sc.s(args: _*))
  }
}
