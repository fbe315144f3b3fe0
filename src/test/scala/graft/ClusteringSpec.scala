package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snapshots
import graft.sources.FileStats.ColRange

/** The clustering contract (`clusterBy` / SQL `PARTITIONED BY`) and
  * plan-time data skipping: writes range-cluster batches into flat
  * files with tight sidecar stats, and EVERY read path — `read()`,
  * `readWhere`, pure SQL text — skips files whose stats cannot match
  * the pushed predicate. Skipped files must never be OPENED (asserted
  * through [[CountingLocalFs]], which survives AQE plan shapes), and
  * results must be exactly the unpruned filter's.
  */
class ClusteringSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def cfsRoot(prefix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    "cfs:" + Files.createTempDirectory(prefix).toString + "/t"
  }

  /** Distinct data files opened while `body` runs. */
  private def opens[T](body: => T): (T, Int) = {
    CountingLocalFs.reset()
    val r = body
    (r, CountingLocalFs.dataFileOpens.size)
  }

  test("clusterBy appends range-cluster the batch; reads skip files on the cluster key") {
    val sp = spark
    import sp.implicits._
    val root = cfsRoot("clspeng")
    val snap = new Snapshots(spark, root)
    snap.createTable("t",
      Seq.empty[(Long, String)].toDF("id", "s"),
      props = Map("clusterBy" -> "id"))
    // hash-shuffled input: clustering must REDISTRIBUTE, not rely on
    // arrival order; 8 incoming partitions pin 8 output files
    snap.append("t",
      (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "s").repartition(8))
    val totalFiles = snap.read("t").inputFiles.length
    assert(totalFiles >= 8, s"expected >=8 data files, got $totalFiles")

    // the ordinary read path (NOT readWhere): the pushed BETWEEN must
    // skip files at plan time through the stats sidecar the clustered
    // append wrote — skipped files are never opened
    val (n, opened) = opens {
      snap.read("t").where(col("id").between(101L, 200L)).count()
    }
    assert(n === 100L)
    assert(opened < totalFiles / 2,
      s"plan-time skipping should open few files: opened $opened of $totalFiles")

    // explicit readWhere agrees (same sidecar, pre-pruned file list)
    val rw = snap.readWhere("t", Seq(ColRange("id", Some(101L), Some(200L))))
    assert(rw.count() === 100L && rw.inputFiles.length < totalFiles / 2)

    // results are the unpruned filter's, exactly
    val full = snap.read("t").where(col("id").between(101L, 200L))
    val pruned = snap.read("t").where(col("id").between(101L, 200L))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)

    // equality pushes too (point lookup on the cluster key)
    val (one, openedEq) = opens {
      snap.read("t").where(col("id") === 777L).count()
    }
    assert(one === 1L && openedEq < totalFiles / 2)
  }

  test("plan-time bloom skipping: equality probe on a hash-scattered column opens holder files only") {
    val sp = spark
    import sp.implicits._
    val root = cfsRoot("clspbloom")
    val snap = new Snapshots(spark, root)
    // ids hash-scattered across 8 files: min/max spans everything, the
    // bloom sidecar is the only thing that can skip
    val df = (1L to 1000L).map(i => (i, i * 3.0)).toDF("id", "v").repartition(8)
    snap.commit(Map("a" -> df), bloomCols = Map("a" -> Seq("id")))
    val totalFiles = snap.read("a").inputFiles.length
    assert(totalFiles >= 8)
    val (n, opened) = opens {
      snap.read("a").where(col("id") === 777L).count()
    }
    assert(n === 1L)
    assert(opened < totalFiles / 2,
      s"bloom skipping should open holder files only: opened $opened of $totalFiles")
    // IN-list probes ride the same veto
    val (n3, opened3) = opens {
      snap.read("a").where(col("id").isin(7L, 77L, 777L)).count()
    }
    assert(n3 === 3L && opened3 < totalFiles,
      s"IN probe opened $opened3 of $totalFiles")
  }

  test("clusterBy validates columns at create and at set; DML keeps the contract") {
    val sp = spark
    import sp.implicits._
    val root = cfsRoot("clspval")
    val snap = new Snapshots(spark, root)
    val e1 = intercept[IllegalArgumentException] {
      snap.createTable("t", Seq((1L, "a")).toDF("id", "s"),
        props = Map("clusterBy" -> "nope"))
    }
    assert(e1.getMessage.contains("nope"))

    snap.createTable("t", Seq.empty[(Long, String)].toDF("id", "s"))
    val e2 = intercept[IllegalArgumentException] {
      snap.setProperties("t", Map("clusterBy" -> "id,nope"))
    }
    assert(e2.getMessage.contains("nope"))

    // adopt clustering on a standing table, then verify DML rewrites
    // keep files skippable (partialRewrite re-sidecars cluster columns)
    snap.setProperties("t", Map("clusterBy" -> "id"))
    snap.append("t", (1L to 600L).map(i => (i, s"v$i")).toDF("id", "s").repartition(6))
    snap.updateWhere("t", Seq(ColRange("id", Some(100L), Some(199L))),
      Map("s" -> lit("upd")), statsCols = Seq("id"))
    snap.deleteWhere("t", Seq(ColRange("id", Some(500L), Some(600L))))
    val totalFiles = snap.read("t").inputFiles.length
    val (rows, opened) = opens {
      snap.read("t").where(col("id").between(100L, 199L))
        .where(col("s") === "upd").count()
    }
    assert(rows === 100L)
    assert(opened < totalFiles,
      s"post-DML reads should still skip: opened $opened of $totalFiles")
    assert(snap.read("t").count() === 499L) // 600 - 101 deleted
  }

  test("type widening keeps skipping: stats and bloom sidecars survive int -> bigint") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.types.LongType
    val root = cfsRoot("clspwiden")
    val snap = new Snapshots(spark, root)
    // INT cluster key + bloom-indexed INT column, narrow era
    snap.createTable("t",
      Seq.empty[(Int, Int, String)].toDF("id", "pt", "s"),
      props = Map("clusterBy" -> "id"))
    snap.append("t",
      (1 to 1000).map(i => (i, i * 31 % 997, s"v$i")).toDF("id", "pt", "s").repartition(8),
      bloomCols = Seq("pt"))
    // widen BOTH columns — the sidecars already store integrals as
    // "long" (stats) and hash them as long (bloom), so nothing rebuilds
    snap.widenColumn("t", "id", LongType)
    snap.widenColumn("t", "pt", LongType)
    val total = snap.read("t").inputFiles.length
    assert(total >= 8)

    // range skipping on the widened cluster key, probed with LONG bounds
    val (n, opened) = opens {
      snap.read("t").where(col("id").between(101L, 200L)).count()
    }
    assert(n === 100L && opened < total / 2,
      s"post-widen range read should skip: opened $opened of $total")

    // bloom point probe with a LONG value over narrow-era files
    val (n2, opened2) = opens {
      snap.read("t").where(col("pt") === (777 * 31 % 997).toLong).count()
    }
    assert(n2 >= 1L && opened2 < total,
      s"post-widen bloom probe should skip: opened $opened2 of $total")

    // post-widen appends keep clustering, now with values past Int range
    snap.append("t",
      (1L to 500L).map(i => (i + 4000000000L, i, s"w$i")).toDF("id", "pt", "s").repartition(4))
    val total2 = snap.read("t").inputFiles.length
    val (n3, opened3) = opens {
      snap.read("t").where(col("id") > 4000000000L).count()
    }
    assert(n3 === 500L && opened3 < total2,
      s"wide-era ranged read should skip narrow-era files: opened $opened3 of $total2")
  }

  test("compact re-establishes GLOBAL clustering across batch-local clusters") {
    val sp = spark
    import sp.implicits._
    val root = cfsRoot("clspcompact")
    val snap = new Snapshots(spark, root)
    snap.createTable("t", Seq.empty[(Long, Long)].toDF("id", "p"),
      props = Map("clusterBy" -> "id"))
    // three appends covering the SAME key range: per-batch clustering
    // leaves every batch's files overlapping every other batch's
    for (b <- 0L until 3L)
      snap.append("t",
        (1L to 900L).map(i => (i, b * 1000L + i)).toDF("id", "p").repartition(4))
    // small target → several output files, globally range-disjoint
    snap.compact("t", targetBytes = 4096L)
    val totalFiles = snap.read("t").inputFiles.length
    assert(totalFiles >= 3, s"compact should keep several files, got $totalFiles")
    val (n, opened) = opens {
      snap.read("t").where(col("id").between(1L, 60L)).count()
    }
    assert(n === 180L)
    assert(opened < totalFiles,
      s"compacted clustered table should skip: opened $opened of $totalFiles")
    assert(snap.read("t").count() === 2700L)
  }

  test("SQL surface: PARTITIONED BY and CLUSTER BY lower to clusterBy; text reads skip files") {
    val sp = spark
    val root = "cfs:" + Files.createTempDirectory("clspsql").toString
    sp.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    sp.conf.set("spark.sql.catalog.gclu", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gclu.root", root)
    sp.sql("CREATE NAMESPACE gclu.db")
    sp.sql("CREATE TABLE gclu.db.t (k BIGINT, p BIGINT) PARTITIONED BY (k)")
    // shuffled insert through pure text (catalog append must cluster)
    sp.range(1, 2001).selectExpr("id", "id * 10 AS p")
      .repartition(8).createOrReplaceTempView("clu_src")
    sp.sql("INSERT INTO gclu.db.t SELECT id AS k, p FROM clu_src")

    // the property is visible as text
    val props = sp.sql("SHOW TBLPROPERTIES gclu.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("clusterBy").contains("k"), s"props: $props")

    val snap = new Snapshots(sp, root + "/db")
    val totalFiles = snap.read("t").inputFiles.length
    assert(totalFiles >= 8)
    val (row, opened) = opens {
      sp.sql("SELECT count(*) AS n, sum(p) AS s FROM gclu.db.t WHERE k BETWEEN 101 AND 300").head
    }
    assert(row.getLong(0) === 200L && row.getLong(1) === (101L to 300L).map(_ * 10).sum)
    assert(opened < totalFiles / 2,
      s"SQL text read should skip clustered files: opened $opened of $totalFiles")

    // CLUSTER BY spelling lowers to the same contract
    sp.sql("CREATE TABLE gclu.db.c (k BIGINT, v BIGINT) CLUSTER BY (k)")
    sp.sql("INSERT INTO gclu.db.c SELECT id AS k, id AS v FROM clu_src")
    val propsC = sp.sql("SHOW TBLPROPERTIES gclu.db.c").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(propsC.get("clusterBy").contains("k"))

    // unsupported transforms refuse loudly (no silent layout change);
    // years/months/days/hours/bucket lower to generated columns since
    // r11 — see the dedicated transform test below
    val e = intercept[Exception] {
      sp.sql("CREATE TABLE gclu.db.bad (s STRING, v BIGINT) PARTITIONED BY (truncate(4, s))")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("value clustering")), s"got: ${chain(e)}")

    // unknown clustering column refuses at CREATE
    val e2 = intercept[Exception] {
      sp.sql("CREATE TABLE gclu.db.bad2 (k BIGINT) PARTITIONED BY (missing)")
    }
    assert(chain(e2).exists(m => m.contains("missing")), s"got: ${chain(e2)}")

    // TBLPROPERTIES at CREATE land in the same single commit:
    // appendOnly declared as text gates DML immediately
    sp.sql("""CREATE TABLE gclu.db.ao (k BIGINT)
             |TBLPROPERTIES ('appendOnly'='true')""".stripMargin)
    sp.sql("INSERT INTO gclu.db.ao VALUES (1), (2)")
    val e3 = intercept[Exception] { sp.sql("DELETE FROM gclu.db.ao WHERE k = 1") }
    assert(chain(e3).exists(_.contains("appendOnly")), s"got: ${chain(e3)}")
    assert(sp.sql("SELECT count(*) FROM gclu.db.ao").head.getLong(0) === 2L)

    // CTAS composes with the clustered layout: CREATE ... PARTITIONED
    // BY ... AS SELECT declares the contract AND the seeding write
    // range-clusters under it in one statement
    sp.sql("""CREATE TABLE gclu.db.ctas PARTITIONED BY (k)
             |AS SELECT id AS k, id * 3 AS v FROM clu_src""".stripMargin)
    val propsT = sp.sql("SHOW TBLPROPERTIES gclu.db.ctas").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(propsT.get("clusterBy").contains("k"))
    assert(sp.sql("SELECT sum(v) FROM gclu.db.ctas WHERE k BETWEEN 1 AND 10")
      .head.getLong(0) == (1L to 10L).map(_ * 3).sum)

    // INSERT OVERWRITE into a clustered table comes out CLUSTERED (the
    // replace batch pays the same range shuffle append pays): the
    // post-overwrite ranged read must still skip files at plan time
    sp.sql("INSERT OVERWRITE gclu.db.ctas SELECT id AS k, id * 7 AS v FROM clu_src")
    val snap2 = new Snapshots(sp, root + "/db")
    val totalAfter = snap2.read("ctas").inputFiles.length
    assert(totalAfter >= 4, s"overwrite should land several clustered files, got $totalAfter")
    CountingLocalFs.reset()
    assert(sp.sql("SELECT sum(v) FROM gclu.db.ctas WHERE k BETWEEN 1 AND 100")
      .head.getLong(0) == (1L to 100L).map(_ * 7).sum)
    val openedOvw = CountingLocalFs.dataFileOpens.size
    assert(openedOvw < totalAfter,
      s"post-overwrite ranged read should skip: opened $openedOvw of $totalAfter")
  }

  test("days()/bucket() transforms: generated partition columns; source-column predicates skip files") {
    val sp = spark
    val root = "cfs:" + Files.createTempDirectory("clsptrans").toString
    sp.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    sp.conf.set("spark.sql.catalog.gtp", classOf[graft.sources.GraftCatalog].getName)
    sp.conf.set("spark.sql.catalog.gtp.root", root)
    sp.sql("CREATE NAMESPACE gtp.db")

    // days(ts): lowered to a generated `ts_day DATE = CAST(ts AS DATE)`
    // + clustering on (ts_day, ts) — declared layout, zero manual DDL
    sp.sql("CREATE TABLE gtp.db.ev (ts TIMESTAMP, v BIGINT) PARTITIONED BY (days(ts))")
    assert(sp.table("gtp.db.ev").schema.fieldNames.toSeq == Seq("ts", "v", "ts_day"))
    val props = sp.sql("SHOW TBLPROPERTIES gtp.db.ev").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("clusterBy").contains("ts_day,ts"), s"props: $props")

    // 16 days of data from a SHUFFLED source, derived column never
    // named by the writer (INSERT column list; Spark pads it NULL, the
    // generated-column contract computes it)
    sp.range(0, 1536).selectExpr(
      "timestampadd(HOUR, CAST(id % 384 AS INT), TIMESTAMP'2024-03-01 00:00:00') AS ts",
      "id AS v").repartition(8).createOrReplaceTempView("tp_src")
    sp.sql("INSERT INTO gtp.db.ev (ts, v) SELECT ts, v FROM tp_src")
    assert(sp.sql("SELECT count(*) FROM gtp.db.ev WHERE ts_day IS NULL").head.getLong(0) == 0L)
    assert(sp.sql("SELECT count(DISTINCT ts_day) FROM gtp.db.ev").head.getLong(0) == 16L)

    val snap = new Snapshots(sp, root + "/db")
    val totalFiles = snap.read("ev").inputFiles.length
    assert(totalFiles >= 8, s"expected >=8 files, got $totalFiles")

    // THE GATE: a predicate on the SOURCE column `ts` (the user never
    // names ts_day) skips day-files at plan time — day-clustering makes
    // each file's ts [min,max] day-tight, and TIMESTAMP_MICROS footers
    // carry real stats the sidecar harvests
    CountingLocalFs.reset()
    val n = sp.sql("""SELECT count(*) FROM gtp.db.ev
                     |WHERE ts >= TIMESTAMP'2024-03-03 00:00:00'
                     |  AND ts < TIMESTAMP'2024-03-05 00:00:00'""".stripMargin).head.getLong(0)
    val opened = CountingLocalFs.dataFileOpens.size
    assert(n == 192L, s"2 of 16 days = 192 rows, got $n")
    assert(opened < totalFiles / 2,
      s"ts-range read should skip day files: opened $opened of $totalFiles")

    // bucket(n, k): generated `k_bucket = pmod(hash(k), 8)` + clustering
    // on (k_bucket, k) — point probes on k open a bucket-local slice
    sp.sql("CREATE TABLE gtp.db.b (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    assert(sp.table("gtp.db.b").schema.fieldNames.toSeq == Seq("k", "v", "k_bucket"))
    sp.range(1, 2001).selectExpr("id AS k", "id * 10 AS v")
      .repartition(8).createOrReplaceTempView("tp_bsrc")
    sp.sql("INSERT INTO gtp.db.b (k, v) SELECT k, v FROM tp_bsrc")
    assert(sp.sql("SELECT count(*) FROM gtp.db.b WHERE k_bucket != pmod(hash(k), 8)")
      .head.getLong(0) == 0L)
    val totalB = snap.read("b").inputFiles.length
    CountingLocalFs.reset()
    assert(sp.sql("SELECT v FROM gtp.db.b WHERE k = 777").head.getLong(0) == 7770L)
    val openedB = CountingLocalFs.dataFileOpens.size
    assert(openedB < totalB,
      s"bucket point probe should not open every file: opened $openedB of $totalB")

    // a derived-name collision refuses loudly at CREATE
    val e = intercept[Exception] {
      sp.sql("CREATE TABLE gtp.db.coll (ts TIMESTAMP, ts_day DATE) PARTITIONED BY (days(ts))") }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("ts_day")), chain(e))

    // the rest of the time family: hours/months/years derive the same
    // way (monotone in ts → source-range predicates stay prunable)
    sp.sql("""CREATE TABLE gtp.db.evh (ts TIMESTAMP, v BIGINT)
             |PARTITIONED BY (hours(ts))""".stripMargin)
    assert(sp.table("gtp.db.evh").schema.fieldNames.toSeq == Seq("ts", "v", "ts_hour"))
    sp.sql("INSERT INTO gtp.db.evh (ts, v) SELECT ts, v FROM tp_src")
    assert(sp.sql("""SELECT count(*) FROM gtp.db.evh
                    |WHERE ts_hour != date_trunc('HOUR', ts)""".stripMargin)
      .head.getLong(0) == 0L)
    sp.sql("""CREATE TABLE gtp.db.evm (ts TIMESTAMP, v BIGINT)
             |PARTITIONED BY (months(ts))""".stripMargin)
    sp.sql("""CREATE TABLE gtp.db.evy (ts TIMESTAMP, v BIGINT)
             |PARTITIONED BY (years(ts))""".stripMargin)
    assert(sp.table("gtp.db.evm").schema.fieldNames.contains("ts_month"))
    assert(sp.table("gtp.db.evy").schema.fieldNames.contains("ts_year"))
  }
}
