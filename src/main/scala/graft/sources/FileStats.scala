package graft.sources

import java.util.Base64
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.SparkSession

/** Per-file column min/max statistics harvested from parquet FOOTERS —
  * the data-skipping index the open table formats keep in their
  * manifests (Delta's per-file stats, Iceberg's manifest entries;
  * public knowledge). The reference's users lean on Postgres indexes to
  * avoid full scans (every Example.hs query carries a BETWEEN range
  * predicate, Example.hs:22-56); a lake engine's equivalent is file
  * skipping: a range predicate consults the stats and never opens
  * files whose [min,max] cannot match.
  *
  * Scale contract (100 TB): stats come from footers ALREADY WRITTEN by
  * every parquet writer — harvesting reads O(files) footers (a few KB
  * each), never data pages, and runs as a distributed Spark job over
  * the file list (the Hadoop conf ships as serialized key/value pairs;
  * `SerializableConfiguration` is private[spark]). Pruning is a
  * driver-side filter over the per-file stats (same cost class as
  * Spark's own partition pruning) that feeds the reader an explicit
  * file list — skipped files cost zero IO, zero tasks.
  */
object FileStats {

  /** One column's stats within one file. `typ` tags how min/max strings
    * compare: "long" (int32/int64 — ints, dates-as-days,
    * timestamps-as-micros), "double" (float4/8), "string" (UTF8
    * binary, Base64-encoded at rest). min/max are None when the file
    * has no non-null value for the column (all-null chunks). `nulls`
    * is −1 when any row group left its null count unset (pruning never
    * reads it; exact metadata-only aggregates refuse it loudly).
    */
  case class ColStat(typ: String, nulls: Long, min: Option[String], max: Option[String])

  /** Pseudo-column carrying the file's ROW COUNT in the same sidecar
    * shape (min = max = rows): the extra fact that upgrades the
    * data-skipping index into a metadata-only aggregate store
    * (count/min/max answered from sidecars alone — Iceberg's
    * metadata-only queries). Harvested from the same footer read the
    * sidecar already pays; never consulted by range pruning.
    */
  val RowsCol = "_rows"

  /** fileName (leaf, not path) -> column -> stats. */
  type TableStats = Map[String, Map[String, ColStat]]

  /** Inclusive-range predicate against a stats column; None = unbounded.
    * Bound values must match the column's stats type: Int/Long for
    * "long", Float/Double for "double", String for "string".
    */
  case class ColRange(col: String, lo: Option[Any], hi: Option[Any])

  private val SidecarName = "_stats"

  /** Data part files of a (non-partitioned) table directory: everything
    * not underscore/dot-prefixed (_SUCCESS, _stats, hidden files).
    */
  def dataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] =
    fs.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))

  // ---- footer harvest ----------------------------------------------------

  /** Read one footer and fold its row-group chunks into per-column
    * (typ, min, max, nulls). Only long/double/string-comparable
    * primitives participate — other physical types (INT96, FIXED_LEN
    * decimals) are simply absent from the stats, which pruning treats
    * as "cannot skip" (conservative, never wrong).
    */
  private def footerStats(conf: Configuration, file: Path, cols: Set[String]): Map[String, ColStat] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val acc = scala.collection.mutable.Map.empty[String, ColStat]
      reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          if (cols.isEmpty || cols(name)) {
            val pt = cc.getPrimitiveType
            val typ = pt.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 => Some("long")
              case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => Some("double")
              case PrimitiveTypeName.BINARY
                  if pt.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                Some("string")
              case _ => None
            }
            typ.foreach { t =>
              val st: org.apache.parquet.column.statistics.Statistics[_] = cc.getStatistics
              if (st != null) {
                val nulls = if (st.isNumNullsSet) st.getNumNulls else -1L
                val mm: Option[(String, String)] =
                  if (st.hasNonNullValue)
                    Some((encode(t, st.genericGetMin.asInstanceOf[AnyRef]),
                          encode(t, st.genericGetMax.asInstanceOf[AnyRef])))
                  else None
                val merged = acc.get(name) match {
                  case None => ColStat(t, nulls, mm.map(_._1), mm.map(_._2))
                  case Some(prev) =>
                    val lo = minOf(t, prev.min, mm.map(_._1))
                    val hi = maxOf(t, prev.max, mm.map(_._2))
                    val n = if (prev.nulls < 0 || nulls < 0) -1L else prev.nulls + nulls
                    ColStat(t, n, lo, hi)
                }
                acc(name) = merged
              }
            }
          }
        }
      }
      val rows = reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      acc(RowsCol) = ColStat("long", 0L, Some(rows.toString), Some(rows.toString))
      acc.toMap
    } finally reader.close()
  }

  private def encode(typ: String, v: AnyRef): String = typ match {
    case "string" =>
      Base64.getEncoder.encodeToString(v.asInstanceOf[Binary].toStringUsingUTF8.getBytes(StandardCharsets.UTF_8))
    case "double" => v.asInstanceOf[Number].doubleValue.toString
    case _ => v.asInstanceOf[Number].longValue.toString
  }

  private def cmp(typ: String, a: String, b: String): Int = typ match {
    case "long" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ =>
      // unsigned UTF-8 byte order, NOT String.compareTo (UTF-16 code
      // units): parquet footer min/max and Spark's binary comparisons
      // both order by unsigned bytes, and the two orders disagree for
      // supplementary-plane characters — a UTF-16 comparison here could
      // wrongly skip files that contain matching rows
      java.util.Arrays.compareUnsigned(Base64.getDecoder.decode(a), Base64.getDecoder.decode(b))
  }

  private[sources] def minOf(typ: String, a: Option[String], b: Option[String]): Option[String] = (a, b) match {
    case (Some(x), Some(y)) => Some(if (cmp(typ, x, y) <= 0) x else y)
    case _ => a.orElse(b)
  }
  private[sources] def maxOf(typ: String, a: Option[String], b: Option[String]): Option[String] = (a, b) match {
    case (Some(x), Some(y)) => Some(if (cmp(typ, x, y) >= 0) x else y)
    case _ => a.orElse(b)
  }

  /** Decode a sidecar min/max string back to its typed value. */
  private[sources] def decodeVal(typ: String, s: String): Any = typ match {
    case "long" => s.toLong
    case "double" => s.toDouble
    case _ => new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)
  }

  /** Harvest footer stats for `cols` (empty = all eligible columns)
    * across every data file under `dir`, as a distributed job over the
    * file list: each task rebuilds the Hadoop conf from shipped
    * key/value pairs and reads only footers.
    */
  def harvest(s: SparkSession, dir: String, cols: Seq[String]): TableStats = {
    val hconf = s.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(hconf)
    val files = dataFiles(fs, new Path(dir)).map(_.getPath.toString)
    if (files.isEmpty) return Map.empty
    val confProps = hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    val colSet = cols.toSet
    val slices = math.min(files.size, s.sparkContext.defaultParallelism)
    s.sparkContext.parallelize(files, slices).mapPartitions { paths =>
      val conf = new Configuration(false)
      confProps.foreach { case (k, v) => conf.set(k, v) }
      paths.map { p =>
        val path = new Path(p)
        path.getName -> footerStats(conf, path, colSet)
      }
    }.collect().toMap // O(files × cols) stat tuples — manifest-sized, not data-sized
  }

  /** Delete zero-row part files from `dir`. A filtered rewrite (e.g. a
    * targeted delete) can leave an empty write partition behind as a
    * rowless parquet file; its footer has no column chunks, so stats
    * can never prune it and every later maintenance pass would re-touch
    * it forever. One footer read per file, only over the just-rewritten
    * dir — bounded work. Returns the number of files dropped.
    */
  def dropEmptyFiles(fs: FileSystem, dir: Path, conf: Configuration): Int = {
    var n = 0
    dataFiles(fs, dir).foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      val rows = try reader.getRecordCount finally reader.close()
      if (rows == 0L) { fs.delete(f.getPath, false); n += 1 }
    }
    n
  }

  // ---- sidecar persistence ----------------------------------------------

  /** Sidecar format, one line per (file, column):
    * `file \t col \t typ \t nulls \t min \t max` with `-` for absent
    * min/max (string values are Base64, so `\t`/newlines can't occur).
    */
  def writeSidecar(fs: FileSystem, dir: Path, stats: TableStats): Unit = {
    val body = stats.toSeq.sortBy(_._1).flatMap { case (f, colStats) =>
      colStats.toSeq.sortBy(_._1).map { case (c, st) =>
        Seq(f, c, st.typ, st.nulls.toString, st.min.getOrElse("-"), st.max.getOrElse("-")).mkString("\t")
      }
    }.mkString("\n")
    val out = fs.create(new Path(dir, SidecarName), true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readSidecar(fs: FileSystem, dir: Path): Option[TableStats] = {
    val p = new Path(dir, SidecarName)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val parsed = body.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(f, c, typ, nulls, mn, mx) = line.split("\t", 6)
      (f, c, ColStat(typ, nulls.toLong, Some(mn).filter(_ != "-"), Some(mx).filter(_ != "-")))
    }.toSeq
    Some(parsed.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => r._2 -> r._3).toMap
    })
  }

  // ---- pruning -----------------------------------------------------------

  private def boundStr(typ: String, v: Any): String = (typ, v) match {
    case ("string", s: String) => Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
    case ("double", n: Number) => n.doubleValue.toString
    case ("long", n: Number) => n.longValue.toString
    case _ => throw new IllegalArgumentException(s"range bound $v does not match stats type $typ")
  }

  /** Can a file with `st` contain a row matching `r`? Missing stats →
    * yes (conservative). A range predicate never matches NULL, so a
    * column that is all-null in the file (min/max absent, stats
    * present) is skippable.
    */
  private def mightMatch(st: Option[ColStat], r: ColRange): Boolean = st match {
    case None => true
    case Some(cs) =>
      (cs.min, cs.max) match {
        case (Some(mn), Some(mx)) =>
          r.lo.forall(lo => cmp(cs.typ, mx, boundStr(cs.typ, lo)) >= 0) &&
            r.hi.forall(hi => cmp(cs.typ, mn, boundStr(cs.typ, hi)) <= 0)
        case _ => false // stats say: no non-null value in this file
      }
  }

  /** The file-skipping step: keep only files whose stats admit every
    * range. Files absent from the stats map are kept (conservative).
    */
  def prune(files: Seq[FileStatus], stats: TableStats, ranges: Seq[ColRange]): Seq[FileStatus] =
    files.filter { f =>
      val colStats = stats.get(f.getPath.getName)
      ranges.forall(r => mightMatch(colStats.flatMap(_.get(r.col)), r))
    }
}
