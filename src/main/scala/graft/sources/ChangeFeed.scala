package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's streaming cursor pointed at the lake, as a
  * FIRST-CLASS Structured Streaming source (reference: `stream`/
  * `parallelStream`, Stream.hs:244-284 / Parallel.hs:17-33 — "declare
  * a cursor, fetch forward in batches, feed a pipeline"). The lake's
  * commit log is already a perfect offset axis: versions are DENSE
  * (each manifest is created at observed-head+1) and immutable, so
  *
  *   offset n  ≡  "everything committed up to version n",
  *   batch (a, b]  ≡  the per-version file-set diffs a→a+1→…→b,
  *
  * and exactly-once falls out of Structured Streaming's offset log —
  * a replayed batch re-reads the same immutable version diff.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.sources.ChangeFeed")
  *     .option("path", lakeRoot).option("table", "orders")
  *     .option("startingVersion", "0")    // 0 = from the beginning
  *     .option("columns", "id,v")         // optional declared projection
  *     .option("maxVersionsPerTrigger", "8")  // optional admission bounds
  *     .option("maxBytesPerTrigger", "256m")  // (either or both)
  *     .load()                            // (selected) schema + _change + _commit_version
  * }}}
  *
  * Rows carry `_change` ('added' | 'removed' — a partial rewrite
  * surfaces as remove(pre-image) + add(post-image), same as
  * [[Snapshots.readChanges]]) and `_commit_version` (the version that
  * produced them, per-version attribution from the stepwise diff).
  * Each micro-batch costs O(files changed in its version span): the
  * planner diffs manifest file lists (no listing — the checkpointed
  * metadata again) and executors read ONLY changed files through the
  * engine's own parquet reader closure (GraftReadShim — vectorized,
  * schema-converted, the same code path FileSourceScanExec ships).
  *
  * Retention contract: the stream's unprocessed window must stay
  * inside [[Snapshots.vacuum]]'s keepLast — the same rule any CDC
  * consumer of the lake already carries (readChanges fails loudly on
  * a collected version; so does this source).
  */
class ChangeFeed extends TableProvider {
  import ChangeFeed._

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    withMeta(tableSchema(SparkSession.active,
      options.get("path"), options.get("table"),
      Option(options.get("columns"))))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeFeedTable(schema, new CaseInsensitiveStringMap(properties))
}

object ChangeFeed {

  val ChangeCol = "_change"
  val VersionCol = "_commit_version"

  /** Test hook: the schema the last planned micro-batch actually read
    * (after column pruning) — lets StreamingSpec machine-assert that a
    * narrow SELECT narrowed the scan instead of trusting the optimizer.
    */
  @volatile private[graft] var lastPlannedSchema: StructType = _

  private[sources] def withMeta(dataSchema: StructType): StructType =
    StructType(dataSchema.fields :+
      StructField(ChangeCol, StringType, nullable = false) :+
      StructField(VersionCol, LongType, nullable = false))

  /** The table's data schema at the current head (metadata-planned when
    * checkpointed, inference fallback otherwise — same as any read).
    * `columns` (comma-separated) narrows it: Catalyst does not run
    * column pruning on DSv2 STREAMING scans (the pushdown rule handles
    * batch relations only — the same reason Delta's CDF source reads
    * full rows), so the source lets the consumer DECLARE its projection
    * and the per-file parquet reads carry only those columns. The scan
    * builder also implements SupportsPushDownRequiredColumns, so if the
    * engine ever prunes streaming scans, narrow SELECTs narrow
    * automatically too.
    */
  private[sources] def tableSchema(s: SparkSession, path: String, table: String,
                                   columns: Option[String] = None): StructType = {
    require(path != null && table != null,
      "graft.sources.ChangeFeed requires .option(\"path\", …) and .option(\"table\", …)")
    val full = new Snapshots(s, path).read(table).schema
    columns.filter(_.trim.nonEmpty).fold(full) { c =>
      StructType(c.split(",").map(n => full(n.trim)))
    }
  }

  /** `st07_change_feed`: the streaming cursor DRIVEN — a real
    * micro-batch query over the c08 diff lake's commit history
    * (startingVersion 1 = consume everything after the base commit,
    * the same window c08's batch readChanges covers), reduced to the
    * identical NET-delta closed form. One oracle therefore pins THREE
    * engines to each other: the batch diff read (c08), the streaming
    * source (this key), and DuckDB's from-scratch recompute. Each run
    * drives a fresh query+checkpoint through processAllAvailable, so
    * the key times genuine micro-batch planning and execution.
    */
  def st07ChangeFeed(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = SnapshotsKeys.stagedDiffLake(s, dir)
    val root = snap.rootPath
    val name = s"cf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = java.nio.file.Files.createTempDirectory("cf_ckpt").toString
    val q = s.readStream
      .format(classOf[ChangeFeed].getName)
      .option("path", root).option("table", "orders")
      .option("startingVersion", "1")
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    s.table(name)
      .groupBy("o_orderkey", "o_orderstatus", "price_cents")
      .agg(sum(when(col(ChangeCol) === "added", 1L).otherwise(-1L)).as("delta"))
      .where(col("delta") =!= 0L)
      .groupBy("delta", "o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"))
      .orderBy("delta", "o_orderstatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("st07_change_feed" -> st07ChangeFeed _)

  val oracles: Map[String, String] = Map(
    // the same closed form as c08_version_diff: the streamed feed and
    // the batch diff read must agree with each other AND with DuckDB
    "st07_change_feed" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |), d AS (
        |  SELECT CAST(1 AS BIGINT) AS delta, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey % 4 = 0 AND o_orderkey NOT BETWEEN 3000 AND 3999
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT) AS delta, o_orderstatus, price_cents FROM c
        |  WHERE o_orderkey % 4 <> 0 AND o_orderkey BETWEEN 3000 AND 3999
        |)
        |SELECT delta, o_orderstatus, count(*) AS n,
        |  CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM d GROUP BY delta, o_orderstatus
        |ORDER BY delta, o_orderstatus""".stripMargin)

  /** Test hook: how many InputPartitions the last micro-batch planned —
    * lets StreamingSpec machine-assert that many small changed files
    * bin-pack into few tasks instead of one task per file.
    */
  @volatile private[graft] var lastPlannedPartitions: Int = -1

  /** One changed file of one version step.
    *
    *  - `positional = false`: emit every row of the file under `change`,
    *    EXCLUDING positions listed for this file in `dvPrev` (a replaced
    *    file's pre-image must not re-remove rows a deletion vector
    *    already removed) / `dvCur` (a re-referenced file's post-image —
    *    a restore to a DV-bearing version — must not resurrect them).
    *  - `positional = true`: the file itself did not change; emit ONLY
    *    rows whose position is tombstoned in `dvCur` but not `dvPrev`
    *    (as `removed` — the Delta CDF contract for deletion vectors,
    *    public design) or un-tombstoned in `dvPrev` but not `dvCur`
    *    (as `added` — a restore resurrecting rows).
    *
    * `dvCur`/`dvPrev` are the (tiny) vector parquet files of the step's
    * two versions; executors read them once per partition.
    */
  private[sources] case class ChangeSlice(
      path: String, length: Long, change: String, version: Long,
      positional: Boolean = false,
      dvCur: Seq[(String, Long)] = Nil,
      dvPrev: Seq[(String, Long)] = Nil)

  /** Several slices bin-packed to ~maxPartitionBytes: task count tracks
    * data VOLUME, not file churn — a version landing 50k small files
    * must not plan 50k tasks (FileSourceScanExec packs splits for the
    * same reason).
    */
  private[sources] case class PackedChangePartition(slices: Seq[ChangeSlice])
    extends InputPartition

  private[sources] class VersionOffset(val v: Long) extends Offset {
    override def json(): String = v.toString
    override def equals(o: Any): Boolean = o match {
      case x: VersionOffset => x.v == v
      case _ => false
    }
    override def hashCode(): Int = v.hashCode
    override def toString: String = s"VersionOffset($v)"
  }
}

private[sources] class ChangeFeedTable(tableSchema: StructType,
                                       options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  import ChangeFeed._

  override def name(): String =
    s"graft-changes(${options.get("path")}#${options.get("table")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  /** Column pruning (SupportsPushDownRequiredColumns): a feed consumer
    * selecting two columns must not read every column of every changed
    * file — the pruned schema flows to the per-file parquet reader, so
    * unselected columns never leave the footer. Catalyst hands the
    * required subset in the original field order (data columns before
    * the virtual `_change`/`_commit_version`), which is exactly the
    * order the reader's data++meta row join produces.
    */
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var pruned: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        pruned = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = pruned
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          // startingTimestamp (Delta's option): "changes committed
          // AFTER ts" — resolves through versionAsOf to the newest
          // version at-or-before ts, which becomes the base offset
          // (the feed delivers strictly later versions). Nothing that
          // old retained → base 0 (the full history).
          val sv = Option(options.get("startingVersion")).map(_.toLong)
          val st = Option(options.get("startingTimestamp")).map(_.toLong)
          require(sv.isEmpty || st.isEmpty,
            "set startingVersion OR startingTimestamp, not both")
          val base = sv.orElse(st.map(ts =>
            new Snapshots(SparkSession.active, options.get("path"))
              .versionAsOf(ts).getOrElse(0L))).getOrElse(0L)
          new ChangeFeedStream(
            options.get("path"), options.get("table"), base,
            Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
            pruned,
            options.getBoolean("refuseDeletionVectors", false),
            Option(options.get("maxBytesPerTrigger")).map(
              org.apache.spark.network.util.JavaUtils.byteStringAsBytes))
        }
      }
    }
}

private[sources] class ChangeFeedStream(root: String, table: String,
                                        startingVersion: Long,
                                        maxVersionsPerTrigger: Option[Long],
                                        fullSchema: StructType,
                                        refuseDv: Boolean = false,
                                        maxBytesPerTrigger: Option[Long] = None,
                                        appendsOnly: Boolean = false,
                                        skipChangeCommits: Boolean = false)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import ChangeFeed._
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  private def spark = SparkSession.active
  private def snap = new Snapshots(spark, root)
  // the data schema is the (possibly pruned) schema minus whatever
  // virtual columns the query kept
  private val dataSchema =
    StructType(fullSchema.fields.filterNot(f =>
      f.name == ChangeCol || f.name == VersionCol))

  // Trigger.AvailableNow pins its end goal at start: process everything
  // committed when the trigger began, then stop — later commits wait
  // for the next run
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(snap.currentVersion.getOrElse(startingVersion))

  private def head: Long = {
    val h = snap.currentVersion.getOrElse(startingVersion)
    availableNowTarget.fold(h)(math.min(h, _))
  }

  override def initialOffset(): Offset = new VersionOffset(startingVersion)
  override def latestOffset(): Offset = new VersionOffset(head)

  /** Admission control: a backfill of many versions arrives as BOUNDED
    * micro-batches (`maxVersionsPerTrigger`), not one giant batch —
    * checkpoint-committed progress between them, the knob every
    * replayable source needs at scale. Without the option each trigger
    * takes everything available (the default read limit).
    */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[VersionOffset].v
    val hi0 = head
    val hi = limit match {
      case m: ReadMaxRows => math.min(hi0, lo + m.maxRows())
      case _ => hi0
    }
    // `maxBytesPerTrigger` (the Delta CDF admission knob, public
    // design): bound a micro-batch by the DATA VOLUME its versions
    // added, not their count — a backlog of fat versions drains in
    // bounded bites while a run of empty/maintenance versions advances
    // in one. Weights come from cached manifest views (no listing). At
    // least one version is always admitted (progress guarantee).
    maxBytesPerTrigger match {
      case None => new VersionOffset(hi)
      case Some(budget) =>
        val s = snap
        var v = lo
        var bytes = 0L
        while (v < hi && (v == lo || bytes < budget)) {
          bytes += s.addedBytesAt(table, v + 1)
          v += 1
        }
        new VersionOffset(v)
    }
  }
  override def reportLatestOffset(): Offset = new VersionOffset(head)

  override def deserializeOffset(json: String): Offset =
    new VersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Stepwise per-version diffs across (start, end] — versions are
    * dense, so the walk is exact and every row gets attributed to the
    * commit that produced it. O(span) manifest reads, O(changed files)
    * slices bin-packed to byte-bounded partitions, zero directory
    * listings (the DV dirs pay one tiny listing each, only on DV
    * versions).
    *
    * Maintenance versions (compaction/clustering, `@maint` in the
    * manifest — rows invariant, files reorganized) emit NOTHING: the
    * walk still advances its file-set cursor through them, so the next
    * DATA version diffs against the compacted layout. Without the skip
    * a 100-TB compaction would flood every consumer with remove+add
    * churn for rows that never changed.
    *
    * Deletion-vector versions (merge-on-read deletes/updates) emit the
    * newly tombstoned rows as `removed` BY POSITION from their
    * unchanged files — the Delta CDF contract (public design) — so one
    * MoR delete no longer parks every standing consumer until a
    * compaction runs. `refuseDeletionVectors` restores the old loud
    * refusal for consumers that must never see a positional delta.
    */
  // the span end of the batch being planned: createReaderFactory (called
  // after planInputPartitions for the same micro-batch) resolves column-
  // mapping names at THIS version — valid span-wide because the walk
  // refuses mapping-change boundaries
  @volatile private var lastPlannedEnd: Option[Long] = None

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[VersionOffset].v
    val hi = end.asInstanceOf[VersionOffset].v
    lastPlannedEnd = Some(hi)
    val s = snap
    val slices = scala.collection.mutable.ArrayBuffer.empty[ChangeSlice]
    // the lo cursor state is resolved LAZILY: a span whose versions
    // never touch the table (commits to other tables) plans with zero
    // file sets built — each step is one cached-view line compare
    var before: Map[String, Long] = null
    var dvPrevRel: Option[String] = None
    var dvPrev: Seq[(String, Long)] = Nil
    var cursorAt = lo // version `before`/`dvPrev` describe when non-null
    def materializeCursor(): Unit = if (before == null) {
      before = if (cursorAt == 0L) Map.empty[String, Long] else s.fileSet(table, cursorAt)
      dvPrevRel = if (cursorAt == 0L) None else s.dvRelOf(table, cursorAt)
      dvPrev = if (cursorAt == 0L) Nil else s.dvAbsFiles(table, cursorAt)
    }
    var v = lo + 1
    while (v <= hi) {
      if (refuseDv && s.hasDeletionVector(table, v))
        throw new IllegalStateException(
          s"version $v of '$table' carries a deletion vector and this stream set " +
            "refuseDeletionVectors — drop the option to consume positional deletes, " +
            "or restart from a checkpoint past a compaction of the table")
      // COLUMN-MAPPING boundary: a rename/drop (or the compact that
      // materializes one) changes the name resolution mid-stream — a
      // fixed-schema streaming query cannot re-label itself, so refuse
      // at the first DATA version under a mapping that differs from
      // the cursor's (the Delta CDF rule for column-mapping schema
      // changes, public design). Batch readChanges handles each side.
      if (s.tableTouchedAt(table, v)) {
        val cmPrev = if (cursorAt == 0L) None else s.colmapLineOf(table, cursorAt)
        val cmCur = s.colmapLineOf(table, v)
        if (cursorAt != 0L && cmCur != cmPrev)
          throw new IllegalStateException(
            s"version $v of '$table' changes the table's column mapping " +
              "(rename/drop, or a compaction that materialized one) — a standing " +
              "stream cannot re-label its schema; restart the stream with a new " +
              s"checkpoint at startingVersion $v or later")
        // TYPE-WIDENING boundary, same rule: a fixed-schema stream bound
        // to the narrow type cannot read the wide pages later versions
        // write (narrowing reads are not a parquet conversion). Additive
        // evolution stays allowed — only a SHARED column's re-type refuses.
        if (cursorAt != 0L) {
          for (a <- s.storedSchemaAt(table, cursorAt); b <- s.storedSchemaAt(table, v)) {
            val bt = b.fields.map(f => f.name -> f.dataType).toMap
            a.fields.foreach { f =>
              bt.get(f.name).filter(_ != f.dataType).foreach { nt =>
                throw new IllegalStateException(
                  s"version $v of '$table' re-types column '${f.name}' " +
                    s"(${f.dataType.simpleString} -> ${nt.simpleString}) — a standing " +
                    "stream cannot re-type its schema; restart the stream with a new " +
                    s"checkpoint at startingVersion $v or later")
              }
            }
          }
        }
      }
      if (!s.tableTouchedAt(table, v)) { v += 1 }
      else {
      materializeCursor()
      val after = s.fileSet(table, v)
      val dvCurRel = s.dvRelOf(table, v)
      val dvCur = if (dvCurRel == dvPrevRel) dvPrev else s.dvAbsFiles(table, v)
      if (!s.isMaintenanceVersion(table, v)) {
        (after -- before.keySet).toSeq.sortBy(_._1).foreach { case (p, len) =>
          slices += ChangeSlice(p, len, "added", v, dvCur = dvCur) }
        (before -- after.keySet).toSeq.sortBy(_._1).foreach { case (p, len) =>
          slices += ChangeSlice(p, len, "removed", v, dvPrev = dvPrev) }
        if (dvCurRel != dvPrevRel && (dvCur.nonEmpty || dvPrev.nonEmpty)) {
          // the vector changed without its files changing: rows flipped
          // state IN PLACE. One tiny job resolves which files the
          // vectors name (O(touched files) names to the driver, never
          // rows); only those files get positional slices.
          val common = before.keySet.intersect(after.keySet)
          val byName = common.map(p => new org.apache.hadoop.fs.Path(p).getName -> p).toMap
          val named = spark.read.parquet((dvCur ++ dvPrev).map(_._1).distinct: _*)
            .select("file_name").distinct().collect().map(_.getString(0))
          named.flatMap(n => byName.get(n)).toSeq.sorted.foreach { p =>
            slices += ChangeSlice(p, before(p), "", v, positional = true,
              dvCur = dvCur, dvPrev = dvPrev)
          }
        }
      }
      before = after
      dvPrevRel = dvCurRel
      dvPrev = dvCur
      cursorAt = v
      v += 1
      }
    }
    // APPENDS-ONLY mode (`spark.readStream.table` on a catalog table —
    // the Delta table-streaming contract, public design): the stream's
    // schema is the TABLE's, so only added rows are expressible; a
    // version that removed or positionally tombstoned rows refuses
    // loudly, pointing at the change feed (which carries both sides) —
    // UNLESS the consumer opted into `skipChangeCommits` (Delta's
    // option, public contract): then every slice of a version that
    // removed/rewrote rows is DROPPED WHOLE (its re-added post-images
    // too — delivering them would duplicate rows the consumer already
    // holds) and only pure-append versions flow
    if (appendsOnly) {
      val changed = slices.filter(sl => sl.positional || sl.change == "removed")
        .map(_.version).toSet
      if (skipChangeCommits) {
        val kept = slices.filterNot(sl => changed(sl.version))
        slices.clear(); slices ++= kept
      } else changed.headOption.foreach { v =>
        throw new IllegalStateException(
          s"version $v of '$table' removed or rewrote rows — a table " +
            "stream delivers appends only; set .option(\"skipChangeCommits\", " +
            "\"true\") to skip mutation versions, stream the CHANGE FEED instead " +
            s"(.readStream.format(\"${classOf[ChangeFeed].getName}\")) or restart " +
            "from a checkpoint past the mutation")
      }
    }
    // bin-pack by bytes: task count follows data volume, not file churn
    val maxBytes = math.max(1L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")))
    val packed = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    var bin = scala.collection.mutable.ArrayBuffer.empty[ChangeSlice]
    var binBytes = 0L
    slices.foreach { sl =>
      if (bin.nonEmpty && binBytes + sl.length > maxBytes) {
        packed += PackedChangePartition(bin.toSeq)
        bin = scala.collection.mutable.ArrayBuffer.empty[ChangeSlice]
        binBytes = 0L
      }
      bin += sl
      binBytes += sl.length
    }
    if (bin.nonEmpty) packed += PackedChangePartition(bin.toSeq)
    ChangeFeed.lastPlannedPartitions = packed.size
    packed.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // built on the driver, shipped to executors — the engine's own
    // parquet file→rows closure (see GraftReadShim; vectorized when the
    // pruned schema allows). dataSchema is the PRUNED subset:
    // unselected columns never leave the parquet footer.
    ChangeFeed.lastPlannedSchema = fullSchema // spec hook: what pruning left
    // under a COLUMN MAPPING the files carry physical names: read with
    // the physical schema in the LOGICAL order — InternalRows are
    // positional, so the logical output layout falls out for free.
    // (Physical names are rename-stable, so the head resolution is
    // valid for every version the walk admits — the mapping-change
    // guard in planInputPartitions refuses the rest.)
    val readDataSchema = lastPlannedEnd.orElse(snap.currentVersion) match {
      case Some(h) if h >= 1L => StructType(dataSchema.fields.map(f =>
        f.copy(name = snap.physicalNameAt(table, h, f.name))))
      case _ => dataSchema
    }
    val readFile = org.apache.spark.sql.GraftReadShim.parquetRowReader(
      spark, readDataSchema, tryBatch = true)
    val readDv = org.apache.spark.sql.GraftReadShim.parquetRowReader(
      spark, ChangeFeedReaderFactory.DvSchema)
    new ChangeFeedReaderFactory(readFile, readDv, fullSchema)
  }
}

private[sources] object ChangeFeedReaderFactory {
  val DvSchema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = true),
    StructField("row_index", LongType, nullable = true)))
}

private[sources] class ChangeFeedReaderFactory(
    readFile: org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow],
    readDv: org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow],
    fullSchema: StructType)
    extends PartitionReaderFactory {
  import ChangeFeed._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slices = partition.asInstanceOf[PackedChangePartition].slices
    new PartitionReader[InternalRow] {
      private def metaRow(change: String, version: Long) = new GenericInternalRow(
        fullSchema.fields.collect {
          case f if f.name == ChangeCol => UTF8String.fromString(change): Any
          case f if f.name == VersionCol => version: Any
        })
      private val joined = new JoinedRow
      private val project = UnsafeProjection.create(fullSchema)

      // one load per DISTINCT vector, one cache slot per role (a
      // positional slice holds BOTH the current and previous vector at
      // once, so the two roles must not evict each other): file_name ->
      // tombstoned positions
      final class DvSlot {
        private var key: Seq[(String, Long)] = null
        private var loaded: java.util.HashMap[String, java.util.HashSet[java.lang.Long]] = _
        def positions(dv: Seq[(String, Long)], name: String): java.util.HashSet[java.lang.Long] = {
          if (dv.isEmpty) return new java.util.HashSet[java.lang.Long]()
          if (key == null || key != dv) {
            val m = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
            dv.foreach { case (p, len) =>
              org.apache.spark.sql.GraftReadShim.flattenRows(
                readDv(org.apache.spark.sql.GraftReadShim.partitionedFile(p, len)))
                .foreach { r =>
                  m.computeIfAbsent(r.getUTF8String(0).toString,
                    (_: String) => new java.util.HashSet[java.lang.Long]()).add(r.getLong(1))
                  ()
                }
            }
            key = dv; loaded = m
          }
          loaded.getOrDefault(name, new java.util.HashSet[java.lang.Long]())
        }
      }
      private val curSlot = new DvSlot
      private val prevSlot = new DvSlot

      private def sliceRows(sl: ChangeSlice): Iterator[InternalRow] = {
        val name = new org.apache.hadoop.fs.Path(sl.path).getName
        if (!sl.positional) {
          val exclude = (if (sl.change == "removed") prevSlot.positions(sl.dvPrev, name)
                         else curSlot.positions(sl.dvCur, name))
          val meta = metaRow(sl.change, sl.version)
          val rows = org.apache.spark.sql.GraftReadShim.flattenRows(
            readFile(org.apache.spark.sql.GraftReadShim.partitionedFile(sl.path, sl.length)))
          if (exclude.isEmpty) rows.map(r => project(joined(r, meta)))
          else {
            var idx = -1L
            rows.flatMap { r =>
              idx += 1
              if (exclude.contains(idx)) None else Some(project(joined(r, meta)))
            }
          }
        } else {
          val cur = curSlot.positions(sl.dvCur, name)
          val prev = prevSlot.positions(sl.dvPrev, name)
          val removedMeta = metaRow("removed", sl.version)
          val addedMeta = metaRow("added", sl.version)
          val anyFlip = {
            val it = cur.iterator()
            var f = false
            while (!f && it.hasNext) f = !prev.contains(it.next())
            if (!f) {
              val it2 = prev.iterator()
              while (!f && it2.hasNext) f = !cur.contains(it2.next())
            }
            f
          }
          if (!anyFlip) Iterator.empty // vector identical for this file: skip the read
          else {
            var idx = -1L
            org.apache.spark.sql.GraftReadShim.flattenRows(
              readFile(org.apache.spark.sql.GraftReadShim.partitionedFile(sl.path, sl.length)))
              .flatMap { r =>
                idx += 1
                val inCur = cur.contains(idx)
                val inPrev = prev.contains(idx)
                if (inCur && !inPrev) Some(project(joined(r, removedMeta)))
                else if (inPrev && !inCur) Some(project(joined(r, addedMeta)))
                else None
              }
          }
        }
      }

      private val rows = slices.iterator.flatMap(sliceRows)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
