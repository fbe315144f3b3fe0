ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pgstreamspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Driver contract: the bench/verify mains must end stdout with ONE unadorned
// JSON line. With fork=true sbt's default LoggedOutput routes the child's
// stdout through the logger ("[info] " prefix) and then prints a trailing
// "[success] Total time..." line — BENCH_r01..r12 all have parsed:null
// because of exactly this. StdoutOutput passes the forked JVM's stdout
// through verbatim; showSuccess/showTiming=false drop the epilogue lines so
// the program's own last line stays last.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// extra forked-JVM flags for ad-hoc profiling (e.g. JFR), space-separated
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] shares one heap between driver and all executor threads;
  // 8g caused GC thrash on the shuffle-heavy dedup queries (host has 128g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
