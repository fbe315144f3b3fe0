package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** MAINTENANCE AS TEXT — the operational verbs through SQL `CALL`
  * (the Iceberg stored-procedure surface, public design; Spark 4's
  * ProcedureCatalog):
  *
  * {{{
  *   CALL graft.system.compact('db', 't')          -- bin-pack small files
  *   CALL graft.system.zorder('db', 't', 'a,b')    -- Z-ORDER clustering
  *   CALL graft.system.vacuum('db', 3)             -- keep last 3 versions
  *   CALL graft.system.analyze('db', 't', 'id')    -- build _stats sidecars
  *   CALL graft.system.rollback('db', 4)           -- re-point the head
  *   CALL graft.system.sync_identity('db', 't')    -- re-sync the id mark
  * }}}
  *
  * Each CALL executes the corresponding Snapshots verb on the driver
  * and returns its outcome as one result row (version published /
  * counts) — the same single enforcement path as the Scala API and
  * the DML-as-text rules.
  */
private[sources] object GraftProcedures {

  val Names: Seq[String] =
    Seq("compact", "compact_where", "zorder", "vacuum", "analyze", "rollback", "sync_identity",
      "copy_into", "clone", "restore", "ann_search", "ann_search_where", "ann_join",
      "ann_index_ivf", "ann_index_append", "ann_search_ivf", "ann_search_ivf_where",
      "dedup_exact", "dedup_minhash", "dedup_containment",
      "create_matview", "refresh_matview", "drop_matview", "atomic")

  def load(rootPrefix: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"graft procedures live in the 'system' namespace, got ${ident.namespace.mkString(".")}")
    def snap(lake: String) =
      new Snapshots(SparkSession.active, s"$rootPrefix/$lake")
    def s(in: InternalRow, i: Int): String = in.getUTF8String(i).toString

    // first non-null vector's length (one single-row task; None on an
    // empty/all-null table, where every search is vacuously empty anyway)
    def embeddingDim(df: org.apache.spark.sql.DataFrame,
                     vecCol: String = "embedding"): Option[Int] = {
      import org.apache.spark.sql.functions._
      df.where(col(vecCol).isNotNull)
        .select(size(col(vecCol))).limit(1).collect()
        .headOption.map(_.getInt(0))
    }

    def proc(nm: String, params: Seq[(String, DataType)],
             out: Seq[(String, DataType)])(body: InternalRow => Seq[Any]): UnboundProcedure =
      procRows(nm, params, out)(in => Seq(body(in)))

    def procRows(nm: String, params: Seq[(String, DataType)],
                 out: Seq[(String, DataType)])(body: InternalRow => Seq[Seq[Any]]): UnboundProcedure =
      new UnboundProcedure {
        override def name(): String = nm
        override def description(): String = s"graft maintenance verb '$nm'"
        override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
          override def name(): String = nm
          override def description(): String = s"graft maintenance verb '$nm'"
          override def parameters(): Array[ProcedureParameter] =
            params.map { case (n, t) => ProcedureParameter.in(n, t).build() }.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val result = body(input)
            val schema = StructType(out.map { case (n, t) =>
              StructField(n, t, nullable = false) })
            val scan: Scan = new LocalScan {
              override def rows(): Array[InternalRow] =
                result.map(r => InternalRow.fromSeq(r)).toArray
              override def readSchema(): StructType = schema
            }
            java.util.List.of(scan).iterator()
          }
        }
      }

    ident.name match {
      case "compact" =>
        proc("compact",
          Seq("lake" -> StringType, "table" -> StringType),
          Seq("version" -> LongType)) { in =>
          Seq(snap(s(in, 0)).compact(s(in, 1)))
        }
      case "compact_where" =>
        // predicate-scoped OPTIMIZE as text (Delta's `OPTIMIZE … WHERE`,
        // public design): only files whose stats MIGHT intersect
        // [lo, hi] on `col` are bin-packed; the rest are re-referenced
        // untouched — at 100 TB you compact the hot ingest slice, never
        // the table. CALL graft.system.compact_where('db','t','ts','a','b')
        proc("compact_where",
          Seq("lake" -> StringType, "table" -> StringType, "col" -> StringType,
            "lo" -> StringType, "hi" -> StringType),
          Seq("version" -> LongType)) { in =>
          val sn0 = snap(s(in, 0)); val t = s(in, 1); val c = s(in, 2)
          // bounds arrive as TEXT; coerce to the column's type so the
          // stats classifier compares in the column's own order
          val dt = sn0.read(t).schema(c).dataType
          def conv(v: String): Any = dt match {
            case ByteType | ShortType | IntegerType | LongType => v.toLong
            case FloatType | DoubleType => v.toDouble
            case DateType => java.time.LocalDate.parse(v)
            case TimestampType =>
              // bounds are UTC by contract (stats are UTC instants):
              // 'yyyy-mm-dd hh:mm:ss' parses as UTC wall time — never
              // the driver JVM's zone, which would silently shift the
              // compacted slice — and full ISO-8601 instants also work
              try java.time.LocalDateTime.parse(v.replace(' ', 'T'))
                .toInstant(java.time.ZoneOffset.UTC)
              catch { case _: java.time.format.DateTimeParseException =>
                java.time.Instant.parse(v) }
            case _: StringType => v
            case other => throw new IllegalArgumentException(
              s"compact_where: unsupported bound type ${other.simpleString} for '$c'")
          }
          Seq(sn0.compactWhere(t,
            Seq(FileStats.ColRange(c,
              Some(s(in, 3)).filter(_.nonEmpty).map(conv),
              Some(s(in, 4)).filter(_.nonEmpty).map(conv))),
            statsCols = Seq(c)))
        }
      case "zorder" =>
        proc("zorder",
          Seq("lake" -> StringType, "table" -> StringType, "cols" -> StringType),
          Seq("version" -> LongType)) { in =>
          val cols = s(in, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          Seq(snap(s(in, 0)).compact(s(in, 1), zorderCols = cols, statsCols = cols))
        }
      case "vacuum" =>
        proc("vacuum",
          Seq("lake" -> StringType, "keep_last" -> IntegerType),
          Seq("versions_dropped" -> IntegerType, "dirs_deleted" -> IntegerType)) { in =>
          val (d, dirs) = snap(s(in, 0)).vacuum(in.getInt(1))
          Seq(d, dirs)
        }
      case "analyze" =>
        proc("analyze",
          Seq("lake" -> StringType, "table" -> StringType, "stats_cols" -> StringType),
          Seq("dirs_analyzed" -> IntegerType)) { in =>
          val cols = s(in, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          Seq(snap(s(in, 0)).analyzeTable(s(in, 1), cols))
        }
      case "rollback" =>
        proc("rollback",
          Seq("lake" -> StringType, "to_version" -> LongType),
          Seq("version" -> LongType)) { in =>
          Seq(snap(s(in, 0)).rollbackTo(in.getLong(1)))
        }
      case "clone" =>
        // zero-copy table clone (metadata-only, shares data files):
        // CALL graft.system.clone('lake', 'src', 'dst')
        proc("clone",
          Seq("lake" -> StringType, "source" -> StringType, "target" -> StringType),
          Seq("version" -> LongType)) { in =>
          Seq(snap(s(in, 0)).cloneTable(s(in, 1), s(in, 2)))
        }
      case "restore" =>
        // per-table point-in-time restore (a NEW version re-pointing at
        // the old file set — history stays intact):
        // CALL graft.system.restore('lake', 'table', version)
        proc("restore",
          Seq("lake" -> StringType, "table" -> StringType, "to_version" -> LongType),
          Seq("version" -> LongType)) { in =>
          Seq(snap(s(in, 0)).restoreTable(s(in, 1), in.getLong(2)))
        }
      case "copy_into" =>
        // idempotent external-file ingest (see SnapshotsDmlOps.copyInto):
        // CALL graft.system.copy_into('lake', 'table', '/path/to/src')
        proc("copy_into",
          Seq("lake" -> StringType, "table" -> StringType, "source" -> StringType),
          Seq("version" -> LongType, "files_ingested" -> LongType)) { in =>
          val (v, n) = snap(s(in, 0)).copyInto(s(in, 1), s(in, 2))
          Seq(v, n.toLong)
        }
      case "sync_identity" =>
        proc("sync_identity",
          Seq("lake" -> StringType, "table" -> StringType),
          Seq("version" -> LongType)) { in =>
          Seq(snap(s(in, 0)).syncIdentity(s(in, 1)))
        }
      // SQL-ADDRESSABLE vector search — the analyst's front door to
      // the embedding corpus, no Scala required:
      //   CALL graft.system.ann_search('lake', 'emb', '0.1,0.2,…', 10)
      //   CALL graft.system.ann_search_where(…, 'label = 2')
      // The SEARCH is a fully distributed job over the lake table's
      // stats-planned scan (queries broadcast as a literal, codegen
      // cosine inside the scan, TakeOrdered per-partition heaps →
      // driver merge of k candidates); only the k result rows are
      // driver-local, which is exactly a CALL's result-set shape. The
      // _where form is the s08 PRE-filter contract as text: the
      // predicate lands on the corpus scan (PushedFilters — ineligible
      // vectors never read, never scored, never take heap slots; a
      // post-filter would under-fill k). The table needs (vec_id
      // BIGINT, embedding ARRAY<numeric>) — the s01 contract; the
      // index-backed forms stay Scala (s03/s05/s12) until their
      // staged index tables gain a CALL too.
      case "ann_search" | "ann_search_where" =>
        def annBody(in: InternalRow, pred: Option[String]): Seq[Seq[Any]] = {
          import org.apache.spark.sql.functions._
          val e0 = snap(s(in, 0)).read(s(in, 1))
          require(e0.columns.contains("vec_id") && e0.columns.contains("embedding"),
            s"ann_search needs (vec_id, embedding) columns, got ${e0.columns.mkString(", ")}")
          val e = pred.filter(_.trim.nonEmpty).map(p => e0.where(expr(p))).getOrElse(e0)
          val vals = s(in, 2).split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble)
          require(vals.nonEmpty, "ann_search: empty query vector")
          val k = in.getInt(3)
          require(k > 0, s"ann_search: k must be positive, got $k")
          val elemType = e.schema("embedding").dataType match {
            case org.apache.spark.sql.types.ArrayType(et, _) => et
            case other => throw new IllegalArgumentException(
              s"ann_search: embedding must be an array column, got $other")
          }
          // dimensionality guard (the ann_search_ivf probe's loud-refusal
          // contract): the codegen cosine computes over min(len) — a
          // wrong-dim query vector would silently truncate every score.
          // One-row sample of the corpus (a single tiny task, not a scan).
          embeddingDim(e).foreach(dim => require(vals.length == dim,
            s"ann_search: query vector has ${vals.length} dimensions, " +
              s"table '${s(in, 1)}' embeddings have $dim"))
          val qv = array(vals.map(v => lit(v).cast(elemType)): _*)
          // TakeOrderedAndProject: per-partition bounded heaps, driver
          // merges k rows — the distributed top-k, no full sort
          val top = e.select(col("vec_id").cast("long").as("neighbor_id"),
              graft.functions.functions.cosine_sim(col("embedding"), qv).as("cos"))
            .orderBy(col("cos").desc, col("neighbor_id").asc)
            .limit(k).collect()
          top.zipWithIndex.map { case (r, i) =>
            // Seq[Any] pins element boxing — a bare Seq(Long, Long,
            // Double) would WIDEN the longs to Double (Scala numeric
            // unification) and break the LongType accessors downstream
            Seq[Any]((i + 1).toLong, r.getLong(0),
              BigDecimal(r.getDouble(1))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }.toSeq
        }
        val out = Seq("rank" -> LongType, "neighbor_id" -> LongType,
          "cos_sim" -> DoubleType)
        if (ident.name == "ann_search")
          procRows("ann_search",
            Seq("lake" -> StringType, "table" -> StringType,
              "qvec" -> StringType, "k" -> IntegerType), out)(
            in => annBody(in, None))
        else
          procRows("ann_search_where",
            Seq("lake" -> StringType, "table" -> StringType,
              "qvec" -> StringType, "k" -> IntegerType,
              "predicate" -> StringType), out)(
            in => annBody(in, Some(s(in, 4))))
      // BATCHED vector search as text — the table-to-table form the
      // per-vector CALLs (ann_search / ann_search_ivf) can't reach:
      //   CALL graft.system.ann_join('lake', 'corpus', 'queries', 10, 'out')
      // finds the exact top-k corpus neighbors of EVERY row of the
      // query table in ONE distributed job (queries broadcast in hash
      // chunks of ≤8192 across the corpus scan, codegen cosine,
      // bounded-heap top-k per query — Ann.annJoinOn) and publishes
      // (q_id, rank, neighbor_id, cos_sim) AS a lake table: k·|queries|
      // result rows land distributed, never on the driver — the CALL
      // returns only a summary row. Self-matches are NOT excluded
      // (distinct tables, unrelated id spaces; a query vector present
      // in the corpus ranks itself first — the s14 contract).
      case "ann_join" =>
        proc("ann_join",
          Seq("lake" -> StringType, "corpus" -> StringType,
            "queries" -> StringType, "k" -> IntegerType, "out" -> StringType),
          Seq("version" -> LongType, "queries" -> LongType, "rows" -> LongType)) { in =>
          val sn = snap(s(in, 0))
          val corpus = sn.read(s(in, 1))
          val queries = sn.read(s(in, 2))
          Seq(s(in, 1) -> corpus, s(in, 2) -> queries).foreach { case (t, df) =>
            require(df.columns.contains("vec_id") && df.columns.contains("embedding"),
              s"ann_join: table '$t' needs (vec_id, embedding) columns, " +
                s"got ${df.columns.mkString(", ")}")
          }
          val k = in.getInt(3)
          require(k > 0, s"ann_join: k must be positive, got $k")
          val out = s(in, 4)
          require(out != s(in, 1) && out != s(in, 2),
            s"ann_join: output table '$out' must differ from corpus and queries")
          val nq = queries.count()
          require(nq > 0, "ann_join: empty query table")
          // same dimensionality contract as ann_search: the codegen
          // cosine computes over min(len) — a dim-mismatched query set
          // would silently truncate every score in the batch
          for (cd <- embeddingDim(corpus); qd <- embeddingDim(queries))
            require(cd == qd, s"ann_join: corpus '${s(in, 1)}' embeddings " +
              s"have $cd dimensions, queries '${s(in, 2)}' have $qd")
          val chunkRows = 8192L
          val nChunks = ((nq + chunkRows - 1) / chunkRows).toInt
          val res = graft.pipeline.Ann.annJoinOn(corpus, queries, k, nChunks)
          val v = sn.replaceTables(Map(out -> (res, Map.empty[String, String])))
          val rows = sn.read(out).count()
          Seq[Any](v, nq, rows)
        }
      // INDEX-BACKED vector search as text — the staged-index half s14
      // left Scala-only. ann_index_ivf TRAINS (k-means|| + Lloyd,
      // Ann.trainCentroids — corpus never shuffled) and PUBLISHES the
      // index as two lake tables: `<index>_cents` (cid, c_vec; ≤
      // nlist ≤ 256 rows) and `<index>` (cid, vec_id, embedding)
      // CLUSTERED BY cid — each coarse list lands as a stat-tight file
      // run, so a probe's `cid IN (…)` scan opens only probed-list
      // files through the standing sidecar skipping: the inverted list
      // realized as lake layout. Rebuilds republish BOTH tables in one
      // manifest commit (replaceTables; history travels) — no reader
      // ever pairs new centroids with old assignments. ann_search_ivf
      // probes: the
      // centroid set is read DRIVER-side (nlist rows — the documented
      // tiny-side exception), the nprobe nearest lists are selected
      // with plain arithmetic, and ONE stats-pruned distributed scan
      // scores only those lists (codegen cosine + TakeOrdered heaps).
      // Approximate by construction (IVF recall ≤ 1) — AnnSpec gates
      // recall and pins CALL == the Scala probe on the same index.
      case "ann_index_ivf" =>
        proc("ann_index_ivf",
          Seq("lake" -> StringType, "source" -> StringType,
            "index" -> StringType, "nlist" -> IntegerType),
          Seq("version" -> LongType, "nlist" -> IntegerType,
            "vectors" -> LongType)) { in =>
          val sn = snap(s(in, 0))
          val e = sn.read(s(in, 1))
          require(e.columns.contains("vec_id") && e.columns.contains("embedding"),
            s"ann_index_ivf needs (vec_id, embedding) columns, got ${e.columns.mkString(", ")}")
          val idx = s(in, 2)
          require(idx.nonEmpty && !idx.endsWith("_cents"),
            s"ann_index_ivf: index table name '$idx' (the '_cents' suffix is reserved)")
          val n = e.count()
          val nl =
            if (in.getInt(3) > 0) in.getInt(3)
            else graft.pipeline.Ann.adaptiveNlist(n)
          val (cents, assigned) = graft.pipeline.Ann.ivfIndexBuild(e, nl)
          // centroids + assignments publish in ONE manifest commit —
          // a reader (or a crash) can never pair NEW centroids with
          // OLD cid assignments, which would silently probe the wrong
          // lists (the torn-rebuild failure mode)
          val v = sn.replaceTables(Map(
            idx + "_cents" -> (cents, Map.empty[String, String]),
            idx -> (assigned, Map(sn.ClusterByProp -> "cid"))))
          // Seq[Any] pins boxing: Seq(Long, Int, Long) would unify the
          // Int to Long and break the IntegerType accessor downstream
          Seq[Any](v, nl, n)
        }
      // INCREMENTAL index maintenance as text (FAISS `add`; s07's CALL
      // twin): new vectors coarse-assign against the EXISTING trained
      // centroids (broadcast argmin — the corpus is never reshuffled)
      // and APPEND to the index table, whose clusterBy=cid contract
      // range-clusters the batch into list-tight files; searches see
      // them immediately through the same stats-pruned probe. Retrain
      // (ann_index_ivf) when drift degrades recall — the s07 lifecycle.
      case "ann_index_append" =>
        proc("ann_index_append",
          Seq("lake" -> StringType, "source" -> StringType, "index" -> StringType),
          Seq("version" -> LongType, "vectors_added" -> LongType)) { in =>
          import org.apache.spark.sql.functions._
          val sn = snap(s(in, 0)); val idx = s(in, 2)
          val batch = sn.read(s(in, 1))
          require(batch.columns.contains("vec_id") && batch.columns.contains("embedding"),
            s"ann_index_append needs (vec_id, embedding) columns, got ${batch.columns.mkString(", ")}")
          val cents = sn.read(idx + "_cents")
          // dim guard: coarse assignment uses the min(len) cosine — a
          // dim-mismatched batch would silently land in wrong lists
          for (bd <- embeddingDim(batch); cd <- embeddingDim(cents, "c_vec"))
            require(bd == cd, s"ann_index_append: batch embeddings have " +
              s"$bd dimensions, index '$idx' centroids have $cd")
          val idxCols = sn.read(idx).columns
          val assigned = graft.pipeline.Ann.ivfAssign(cents, batch)
          require(idxCols.sorted.sameElements(assigned.columns.sorted),
            s"ann_index_append batch columns ${assigned.columns.sorted.mkString(",")} != " +
              s"index '$idx' columns ${idxCols.sorted.mkString(",")}")
          val n = batch.count()
          val v = sn.append(idx, assigned.select(idxCols.map(col(_)).toSeq: _*))
          Seq[Any](v, n)
        }
      case "ann_search_ivf" | "ann_search_ivf_where" =>
        def ivfBody(in: InternalRow, pred: Option[String]): Seq[Seq[Any]] = {
          import org.apache.spark.sql.functions._
          val sn = snap(s(in, 0)); val idx = s(in, 1)
          val k = in.getInt(3); val nprobe = in.getInt(4)
          require(k > 0, s"ann_search_ivf: k must be positive, got $k")
          require(nprobe > 0, s"ann_search_ivf: nprobe must be positive, got $nprobe")
          val qv = s(in, 2).split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble)
          require(qv.nonEmpty, "ann_search_ivf: empty query vector")
          // probe selection on the driver: nlist ≤ 256 centroid rows
          val cents = sn.read(idx + "_cents").collect()
            .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
          require(cents.nonEmpty, s"ann_search_ivf: index '${idx}_cents' is empty")
          // a wrong-dimensionality query vector must refuse loudly —
          // silently truncating the loop would select the wrong probe
          // lists and return quietly-wrong neighbors
          require(qv.length == cents.head._2.length,
            s"ann_search_ivf: query vector has ${qv.length} dimensions, " +
              s"index '$idx' expects ${cents.head._2.length}")
          def cos(c: Array[Float]): Double = {
            var (d, na, nb) = (0.0, 0.0, 0.0)
            var i = 0
            while (i < c.length) {
              d += c(i) * qv(i); na += c(i) * c(i); nb += qv(i) * qv(i); i += 1 }
            if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
          }
          val probed = cents.map { case (cid, v) => (cid, cos(v)) }
            .sortBy { case (cid, c) => (-c, cid) }.take(nprobe).map(_._1)
          val a = sn.read(idx)
          val elemType = a.schema("embedding").dataType match {
            case org.apache.spark.sql.types.ArrayType(et, _) => et
            case other => throw new IllegalArgumentException(
              s"ann_search_ivf: embedding must be an array column, got $other")
          }
          val qcol = array(qv.map(v => lit(v).cast(elemType)).toSeq: _*)
          // ONE distributed scan over the probed lists only — the
          // cid IN (…) predicate prunes files through the sidecar
          // stats; the _where form's predicate lands on the SAME scan
          // (pre-filter: ineligible rows never scored, never take heap
          // slots — the s12 contract inside the index path)
          val listed = a.where(col("cid").isin(probed.map(Int.box).toSeq: _*))
          val eligible = pred.filter(_.trim.nonEmpty)
            .map(p => listed.where(expr(p))).getOrElse(listed)
          val top = eligible
            .select(col("vec_id").cast("long").as("neighbor_id"),
              graft.functions.functions.cosine_sim(col("embedding"), qcol).as("cos"))
            .orderBy(col("cos").desc, col("neighbor_id").asc)
            .limit(k).collect()
          top.zipWithIndex.map { case (r, i) =>
            Seq[Any]((i + 1).toLong, r.getLong(0),
              BigDecimal(r.getDouble(1))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }.toSeq
        }
        val ivfOut = Seq("rank" -> LongType, "neighbor_id" -> LongType,
          "cos_sim" -> DoubleType)
        if (ident.name == "ann_search_ivf")
          procRows("ann_search_ivf",
            Seq("lake" -> StringType, "index" -> StringType,
              "qvec" -> StringType, "k" -> IntegerType, "nprobe" -> IntegerType),
            ivfOut)(in => ivfBody(in, None))
        else
          procRows("ann_search_ivf_where",
            Seq("lake" -> StringType, "index" -> StringType,
              "qvec" -> StringType, "k" -> IntegerType, "nprobe" -> IntegerType,
              "predicate" -> StringType),
            ivfOut)(in => ivfBody(in, Some(s(in, 5))))
      // DEDUP AS TEXT — the curation pipeline's first verb at the SQL
      // front door. dedup_exact MUTATES: keep ONE row per key_cols
      // value (the kept row is the group's minimum non-key tuple —
      // deterministic without asking for a tiebreaker; '' keys =
      // full-row DISTINCT) and republish the table in ONE version
      // through replaceWhere's unbounded range (atomic; history
      // travels; table metadata/clusterBy survive). One hash shuffle +
      // one rewrite — the canonical linear cost of exact dedup at any
      // scale. dedup_minhash REPORTS: the d02 LSH pipeline
      // (shingle → 128-perm signature → 16-band equi-join →
      // bloom-pruned exact-Jaccard verify) over any (id, text) lake
      // table; only the ≤max_pairs result rows reach the driver, and
      // overflow refuses loudly instead of truncating silently.
      case "dedup_exact" =>
        proc("dedup_exact",
          Seq("lake" -> StringType, "table" -> StringType, "key_cols" -> StringType),
          Seq("version" -> LongType, "rows_before" -> LongType,
            "rows_removed" -> LongType)) { in =>
          import org.apache.spark.sql.functions._
          val sn = snap(s(in, 0)); val t = s(in, 1)
          val df = sn.read(t)
          val keys = s(in, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          keys.foreach(k => require(df.columns.contains(k),
            s"dedup_exact: key column '$k' is not a column of '$t' " +
              s"(${df.columns.sorted.mkString(", ")})"))
          val rest = df.columns.filterNot(keys.contains).toSeq
          val deduped0 =
            if (keys.isEmpty || rest.isEmpty) df.distinct()
            else df.groupBy(keys.map(col): _*)
              .agg(min(struct(rest.map(col): _*)).as("_keep"))
              .select(df.columns.map(c =>
                (if (keys.contains(c)) col(c) else col(s"_keep.$c")).as(c)).toSeq: _*)
          // persist the deduped frame so the result-count and the
          // rewrite share ONE groupBy job instead of recomputing it;
          // the fully-unbounded range's matchCond is lit(true), so
          // NULLs anywhere (including the anchor column) pass — TxnSpec
          // pins dedup over a null-bearing first column
          val deduped = deduped0.persist()
          try {
            val before = df.count()
            val after = deduped.count()
            val v = sn.replaceWhere(t,
              Seq(FileStats.ColRange(df.columns.head, None, None)), deduped)
            Seq(v, before, before - after)
          } finally deduped.unpersist()
        }
      case "dedup_minhash" =>
        procRows("dedup_minhash",
          Seq("lake" -> StringType, "table" -> StringType, "id_col" -> StringType,
            "text_col" -> StringType, "threshold" -> DoubleType,
            "max_pairs" -> IntegerType),
          Seq("a_id" -> LongType, "b_id" -> LongType, "jaccard" -> DoubleType)) { in =>
          val cap = in.getInt(5)
          require(cap > 0, s"dedup_minhash: max_pairs must be positive, got $cap")
          val pairs = graft.pipeline.Dedup.minhashPairs(
            snap(s(in, 0)).read(s(in, 1)), s(in, 2), s(in, 3), in.getDouble(4))
          val rows = pairs.limit(cap + 1).collect()
          require(rows.length <= cap,
            s"dedup_minhash: more than $cap near-duplicate pairs — raise " +
              "max_pairs or materialize through the Scala API (Dedup.minhashPairs)")
          rows.map(r => Seq[Any](r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        }
      // CONTAINMENT dedup as text — the asymmetric near-dup screen
      // (short doc embedded in a longer one) over any (id, text) lake
      // table; same report shape and overflow contract as dedup_minhash
      case "dedup_containment" =>
        procRows("dedup_containment",
          Seq("lake" -> StringType, "table" -> StringType, "id_col" -> StringType,
            "text_col" -> StringType, "threshold" -> DoubleType,
            "max_pairs" -> IntegerType),
          Seq("a_id" -> LongType, "b_id" -> LongType,
            "containment" -> DoubleType, "jaccard" -> DoubleType)) { in =>
          val cap = in.getInt(5)
          require(cap > 0, s"dedup_containment: max_pairs must be positive, got $cap")
          val pairs = graft.pipeline.Dedup.containmentPairs(
            snap(s(in, 0)).read(s(in, 1)), s(in, 2), s(in, 3), in.getDouble(4))
          val rows = pairs.limit(cap + 1).collect()
          require(rows.length <= cap,
            s"dedup_containment: more than $cap containment pairs — raise " +
              "max_pairs or materialize through the Scala API (Dedup.containmentPairs)")
          rows.map(r =>
            Seq[Any](r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
        }
      // MATERIALIZED VIEWS AS TEXT (see [[Matview]]): create computes
      // the defining aggregate once and publishes (rows, watermark) in
      // ONE manifest; refresh folds the source's change feed in —
      // O(changed files), never O(table); drop removes both. The mv
      // reads as an ordinary lake table (`SELECT * FROM graft.db.mv`).
      case "create_matview" =>
        proc("create_matview",
          Seq("lake" -> StringType, "name" -> StringType, "query" -> StringType),
          Seq("version" -> LongType, "watermark" -> LongType)) { in =>
          val (v, wm) = Matview.create(snap(s(in, 0)), s(in, 1), s(in, 2))
          Seq(v, wm)
        }
      case "refresh_matview" =>
        proc("refresh_matview",
          Seq("lake" -> StringType, "name" -> StringType),
          Seq("version" -> LongType, "from_version" -> LongType,
            "to_version" -> LongType)) { in =>
          val (v, from, to) = Matview.refresh(snap(s(in, 0)), s(in, 1))
          Seq(v, from, to)
        }
      case "drop_matview" =>
        proc("drop_matview",
          Seq("lake" -> StringType, "name" -> StringType),
          Seq("dropped" -> BooleanType)) { in =>
          Seq(Matview.drop(snap(s(in, 0)), s(in, 1)))
        }
      // ATOMIC MULTI-STATEMENT TRANSACTIONS AS TEXT (see
      // [[AtomicScript]]): the script's lake writes land in ONE
      // manifest publish — all or nothing, first-committer-wins.
      case "atomic" =>
        proc("atomic",
          Seq("lake" -> StringType, "script" -> StringType),
          Seq("version" -> LongType, "statements" -> LongType)) { in =>
          val (v, n) = AtomicScript.run(snap(s(in, 0)), s(in, 1))
          Seq(v, n.toLong)
        }
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure '$other' (${Names.mkString("/")})")
    }
  }
}
