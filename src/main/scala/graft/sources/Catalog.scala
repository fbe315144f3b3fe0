package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over a directory of parquet tables.
  *
  * Analog of the reference's `connect` + schema access
  * (reference: src/Database/PostgreSQL/Stream/Connection.hs:67-71): a
  * pgstream user connects to a database and queries named tables; a
  * graft user points the catalog at a lake prefix and gets the same
  * named-table surface, with Catalyst seeing a declarative parquet scan
  * (pushdown + pruning) instead of a row socket.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table in `dir` as a temp view so both the DataFrame
    * API and `spark.sql` (the QueryBuilder path) resolve the same names
    * DuckDB's oracle resolves.
    */
  def register(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }

  def registered(spark: SparkSession, dir: String): SparkSession = {
    register(spark, dir)
    spark
  }
}
