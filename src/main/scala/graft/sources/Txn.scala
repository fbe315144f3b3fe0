package graft.sources

import org.apache.spark.sql.DataFrame

/** Transaction isolation for [[Txn]] — the reference's selectable menu
  * (Stream.hs:166-231) mapped onto the lake:
  *
  *  - [[Isolation.Snapshot]]: all reads pin the transaction's base
  *    version; the commit merges into the head with FIRST-COMMITTER-
  *    WINS on the write set (a concurrent change to a table this
  *    transaction writes aborts it — the lost-update anomaly snapshot
  *    isolation forbids). Read-write cycles (write skew) can still
  *    commit.
  *  - [[Isolation.Serializable]]: Snapshot plus commit-time validation
  *    of the READ set — any table this transaction read that changed
  *    since its base version aborts the commit
  *    ([[Snapshots.SerializationConflictException]]). Write skew dies
  *    here.
  */
sealed trait Isolation
object Isolation {
  case object Snapshot extends Isolation
  case object Serializable extends Isolation
}

/** The `withTransaction` ergonomic analog (Stream.hs:166-231): one
  * object that pins a snapshot for every read, buffers writes, and
  * publishes them in ONE atomic commit under the chosen isolation.
  * The underlying machinery is [[Snapshots.commitSerializable]] — the
  * transaction tracks which tables were read and written and passes
  * the right conflict set for its isolation level.
  *
  * Usage mirrors the reference:
  * {{{
  *   snap.withTransaction(Isolation.Serializable) { txn =>
  *     val bal = txn.read("accounts").where(...)
  *     txn.write("accounts", debited)
  *   } // commits here; an exception in the body publishes NOTHING
  * }}}
  *
  * ROLLBACK is the absence of commit: an abandoned Txn has staged no
  * bytes and published no manifest, so there is nothing to undo — the
  * same property the protocol gives crashed writers. A read-only
  * transaction commits without publishing (its snapshot pin IS its
  * serializability proof).
  */
final class Txn private[sources] (snap: Snapshots, val isolation: Isolation) {

  /** The snapshot every read of this transaction sees (0 = the lake
    * was empty when the transaction began).
    */
  val baseVersion: Long = snap.currentVersion.getOrElse(0L)

  private val writes = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
  private val stats = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
  private val readSet = scala.collection.mutable.LinkedHashSet.empty[String]
  private var completed = false

  private[sources] def isCompleted: Boolean = completed

  private def pinned: Option[Long] = {
    require(baseVersion > 0L, s"transaction began on an empty lake — nothing to read")
    Some(baseVersion)
  }

  /** Snapshot-pinned read: every read of this transaction sees
    * `baseVersion`, regardless of concurrent commits.
    */
  def read(table: String): DataFrame = {
    readSet += table
    snap.read(table, pinned)
  }

  /** Snapshot-pinned stats-skipping range read. */
  def readWhere(table: String, ranges: Seq[FileStats.ColRange]): DataFrame = {
    readSet += table
    snap.readWhere(table, ranges, pinned)
  }

  /** Buffer a table write; nothing is staged or visible until
    * [[commit]]. Writing the same table twice keeps the last value
    * (the transaction's final word on it).
    */
  def write(table: String, df: DataFrame, statsCols: Seq[String] = Nil): Unit = {
    require(!completed, "transaction already completed")
    writes(table) = df
    if (statsCols.nonEmpty) stats(table) = statsCols
  }

  /** Publish every buffered write in one atomic commit under this
    * transaction's isolation. Returns the committed version — or
    * `baseVersion` for a read-only transaction, which publishes
    * nothing (its pinned snapshot is already a serializable point).
    */
  def commit(): Long = {
    require(!completed, "transaction already completed")
    completed = true
    if (writes.isEmpty) return baseVersion
    // Snapshot: first-committer-wins on the WRITE set (no lost
    // updates); Serializable: additionally validate the READ set
    val conflictSet = isolation match {
      case Isolation.Serializable => readSet.toSet ++ writes.keySet
      case Isolation.Snapshot => writes.keySet.toSet
    }
    snap.commitSerializable(writes.toMap, conflictSet, baseVersion,
      statsCols = stats.toMap)
  }
}

/** MULTI-STATEMENT ATOMIC TRANSACTIONS AS TEXT —
  * `CALL graft.system.atomic('db', '<script>')`: runs a SQL script
  * (one statement, or a Spark-4 `BEGIN … END` scripting block) with an
  * open [[Snapshots.TxnScope]] on the lake, so every statement's
  * manifest publish lands in a VIRTUAL chain — statement N reads
  * statement N-1's writes, other sessions see nothing — and the final
  * state publishes in ONE real manifest write. This is [[Txn]]
  * (`withTransaction`, reference Stream.hs:166-231) composed with the
  * c38 SQL-scripting surface: the two-table CDC-apply script the
  * reference's consumer loop runs becomes one atomic version.
  *
  * Failure model: an exception ANYWHERE in the script discards the
  * scope — the lake never sees a prefix. Staged data files without a
  * manifest are the protocol's standing crashed-writer invariant
  * (invisible, vacuum food). Concurrency: first-committer-wins on the
  * WHOLE scope — the closing publish claims exactly base+1, and a lake
  * that advanced mid-script aborts with
  * [[Snapshots.SerializationConflictException]] (re-run the script).
  * Reads inside the script see the scope's virtual head; `vacuum`
  * refuses inside a scope (file deletion is not transactional);
  * scopes do not nest.
  */
object AtomicScript {

  /** Returns (published version, virtual statements folded). A script
    * that writes nothing publishes nothing and returns (base, 0).
    */
  def run(sn: Snapshots, script: String): (Long, Int) = {
    val base = sn.currentVersion.getOrElse(0L)
    val baseM =
      if (base == 0L) Map.empty[String, String] else sn.readManifest(base)
    val scope = Snapshots.openScope(sn.rootPath, base, baseM)
    // set-and-restore: the scripting flag is a session-wide behavior
    // switch; leaking it past the CALL would change how later user
    // statements parse
    val prevScripting = sn.s.conf.getOption("spark.sql.scripting.enabled")
    val (finalM, changed) =
      try {
        sn.s.conf.set("spark.sql.scripting.enabled", "true")
        sn.s.sql(script).collect()
        (scope.finalManifest, scope.changed)
      } finally {
        Snapshots.closeScope(sn.rootPath)
        prevScripting match {
          case Some(v) => sn.s.conf.set("spark.sql.scripting.enabled", v)
          case None => sn.s.conf.unset("spark.sql.scripting.enabled")
        }
      }
    finalM match {
      case None => (base, 0)
      case Some(m) =>
        // claim exactly base+1: the scope's state was derived from the
        // base manifest, so ANY intervening commit is a conflict
        if (!sn.writeManifest(base + 1, m))
          throw new Snapshots.SerializationConflictException(
            s"atomic script lost to a concurrent commit at ${sn.rootPath}: " +
              s"the lake advanced past version $base while the script ran — " +
              "re-run the CALL from the new head")
        (base + 1, changed)
    }
  }
}
