package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

/** Exercises the JDBC source path end-to-end against embedded Derby —
  * the JDBC engine that ships with Spark — since the container has no
  * live Postgres. What is under test is OUR read surface: the
  * range-partitioned parallel scan (the distributed FETCH FORWARD
  * analog), predicate pushdown reaching the database, and the
  * arbitrary-SQL `query` analog. Only the URL differs from a Postgres
  * deployment.
  */
class JdbcSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private lazy val dbPath = {
    val dir = java.nio.file.Files.createTempDirectory("derby").toString + "/db"
    val conn = DriverManager.getConnection(s"jdbc:derby:$dir;create=true")
    val st = conn.createStatement()
    st.executeUpdate("CREATE TABLE ORDERS_J (ID BIGINT NOT NULL, PRICE DOUBLE, STATUS VARCHAR(1))")
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement("INSERT INTO ORDERS_J VALUES (?, ?, ?)")
    (0 until 1000).foreach { i =>
      ps.setLong(1, i.toLong)
      ps.setDouble(2, i * 1.5)
      ps.setString(3, if (i % 2 == 0) "F" else "O")
      ps.addBatch()
    }
    ps.executeBatch(); conn.commit(); conn.close()
    dir
  }

  private def cs = Jdbc.ConnSettings(host = "unused",
    urlOverride = Some(s"jdbc:derby:$dbPath"), user = "", password = "")

  test("range-partitioned read shards the scan and loses no rows") {
    val df = Jdbc.read(spark, cs, "ORDERS_J", "ID", 0, 1000, numPartitions = 8)
    assert(df.rdd.getNumPartitions == 8, "each executor slice must be its own range query")
    assert(df.count() == 1000)
    val sum = df.agg(org.apache.spark.sql.functions.sum("PRICE")).head().getDouble(0)
    assert(sum == (0 until 1000).map(_ * 1.5).sum, "range boundaries must not drop/dup rows")
  }

  test("filters push down to the database, not the executor") {
    val df = Jdbc.read(spark, cs, "ORDERS_J", "ID", 0, 1000, numPartitions = 4)
      .where("ID < 100 AND STATUS = 'F'")
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters") && p.contains("LessThan(ID,100)"),
      "WHERE must ship to the database: " + p)
    assert(df.count() == 50)
  }

  test("readQuery runs caller SQL on the database (the query analog)") {
    val df = Jdbc.readQuery(spark, cs,
      "SELECT STATUS, COUNT(*) AS N, SUM(PRICE) AS TOTAL FROM ORDERS_J GROUP BY STATUS")
    val rows = df.orderBy("STATUS").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Number]("N").longValue()).toSeq == Seq(500L, 500L))
  }

  test("readDim single-query read matches the partitioned read") {
    val dim = Jdbc.readDim(spark, cs, "ORDERS_J")
    assert(dim.count() == 1000)
    assert(dim.rdd.getNumPartitions == 1, "dim read is one cursor by design")
  }
}
