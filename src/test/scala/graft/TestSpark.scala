package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM (sequential
  * suites; building a session per suite would dominate test wall time).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sfTest = "/root/testdata/sf0.001"
}
