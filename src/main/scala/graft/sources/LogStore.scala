package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Commit-LOG storage contract — the seam that makes the manifest
  * protocol's atomicity requirement EXPLICIT per storage class (the
  * Delta LogStore split, public design: the log's conditional-put is
  * a store contract, not a filesystem assumption).
  *
  * The lake's one serialization point is "publish version N iff no
  * other writer did" ([[putIfAbsent]]). Data files never need it —
  * they land under writer-unique staging dirs and become visible only
  * through a manifest — so ONLY the commit log routes through this
  * trait:
  *
  *  - local POSIX → hard-link publish ([[HadoopLogStore]]; Hadoop's
  *    RawLocalFileSystem `create(overwrite=false)` is check-then-act,
  *    see the method doc),
  *  - HDFS-class → namenode-serialized create-exclusive
  *    ([[HadoopLogStore]]),
  *  - S3-class object stores → conditional put (`If-None-Match: *`),
  *    modeled exactly by [[InMemoryObjectStore]] so the whole manifest
  *    protocol (races, torn-read freedom, delta chains, checkpoints,
  *    vacuum) is testable against object-store semantics without
  *    egress. A production S3 binding implements this trait with one
  *    conditional PUT per manifest; everything above the trait is
  *    already proven against it.
  *
  * Readers must NEVER observe a half-written object through any
  * implementation: hard link (atomic dentry), rename (atomic on
  * HDFS), and object PUT (objects appear whole or not at all) all
  * guarantee it; implementations added later must too.
  */
trait LogStore {

  /** Publish `body` at `path` iff nothing exists there — ATOMICALLY.
    * Returns false on a lost race (someone else's object stands);
    * throws on real IO failure. The caller treats false as "retry at
    * the next version", so a wrong false re-writes table data — never
    * report an IO error as a race.
    */
  def putIfAbsent(path: Path, body: Array[Byte]): Boolean

  /** Overwrite `path` with `body`, atomically with respect to readers
    * (no torn reads). Used for checkpoints — idempotent, regenerable
    * content where last-writer-wins is correct.
    */
  def overwrite(path: Path, body: Array[Byte]): Unit

  /** Full object bytes; java.io.FileNotFoundException if absent. */
  def read(path: Path): Array[Byte]

  def exists(path: Path): Boolean

  /** Names (not paths) of objects directly under `dir`; Nil if none.
    * On an object store this is a prefix LIST — the manifest listing
    * is O(retained versions) names, which vacuum bounds.
    */
  def list(dir: Path): Seq[String]

  /** Modification time in epoch ms — the timestamp-travel FALLBACK for
    * headerless (v1/external) manifests only; headered manifests carry
    * their commit time in-body.
    */
  def mtime(path: Path): Long

  /** Remove `path` if present; absent is not an error (vacuum replays
    * and racing vacuums both hit already-deleted objects).
    */
  def delete(path: Path): Unit

  /** Ensure `dir` exists (no-op on stores without directories). */
  def mkdirs(dir: Path): Unit

  final def readString(path: Path): String =
    new String(read(path), StandardCharsets.UTF_8)
}

object LogStore {
  /** Store for `root`'s scheme: Hadoop-backed everywhere today (its
    * putIfAbsent dispatches local-link vs create-exclusive
    * internally); an s3:// binding would return the conditional-put
    * implementation here.
    */
  def forFs(fs: FileSystem): LogStore = new HadoopLogStore(fs)
}

/** Hadoop-filesystem LogStore: the local hard-link / HDFS
  * create-exclusive publish (see [[putIfAbsent]]) and temp+rename
  * checkpoint overwrite. One instance per writer — the private temp
  * names carry a per-instance tag so concurrent writers on one store
  * never collide on temp files.
  *
  * `hook` (identity in production) fires with a step label at the two
  * in-store crash points of a publish — "store-temp-write" (before the
  * private temp body lands) and "store-link" (temp written, link/
  * create pending) — for the crash-sweep model test. A real crash at
  * store-link leaves a dot-prefixed temp file no listing matches and
  * no reader opens (invisible residue); the injected throw cleans it
  * eagerly — observationally equivalent, and the throw additionally
  * exercises every CALLER's abort path.
  */
final class HadoopLogStore(fs: FileSystem,
                           hook: String => Unit = _ => ()) extends LogStore {

  private val tag =
    java.lang.Long.toHexString(new java.security.SecureRandom().nextLong() | (1L << 62))

  /** The store must provide an ATOMIC create-if-absent. HDFS-class
    * filesystems do (the namenode serializes create(overwrite=false)).
    * The LOCAL filesystem does NOT: Hadoop's RawLocalFileSystem
    * create(overwrite=false) is check-then-act, so two threads racing
    * one version can BOTH pass the probe and the loser silently
    * truncates the winner's bytes — and any create-then-write publish
    * leaves a torn-read window where a concurrent reader sees a
    * half-written manifest. For local paths both holes close at once
    * with a HARD-LINK publish: the body lands in a private temp file,
    * and `Files.createLink(target, tmp)` is an atomic POSIX
    * create-if-absent that makes the manifest appear fully written or
    * not at all (losers get FileAlreadyExistsException from the
    * kernel, not a probe). The threaded-writer TxnSpec stress drives
    * exactly this race.
    */
  override def putIfAbsent(target: Path, body: Array[Byte]): Boolean = {
    val local = fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      Option(target.toUri.getScheme).forall(_ == "file")
    if (local) {
      val dst = java.nio.file.Paths.get(target.toUri.getPath)
      val tmp = dst.resolveSibling(s".${dst.getFileName}.tmp-$tag")
      hook("store-temp-write")
      java.nio.file.Files.write(tmp, body)
      try {
        hook("store-link")
        java.nio.file.Files.createLink(dst, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally { java.nio.file.Files.deleteIfExists(tmp); () }
    } else {
      hook("store-temp-write"); hook("store-link") // one create step here
      val out =
        try fs.create(target, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
          case _: java.nio.file.FileAlreadyExistsException => return false
          // some FileSystem impls signal the exclusive-create loss as a
          // bare IOException; it is a race iff the target now exists
          case e: java.io.IOException =>
            return if (fs.exists(target)) false else throw e
        }
      // past the create, the version is OURS: a body-write failure must
      // not leave a truncated manifest in the log as a readable version
      // (and must not be misread as a lost race by the exists() probe
      // above on retry) — delete the partial file before propagating
      try {
        try out.write(body) finally out.close()
        true
      } catch {
        case e: Throwable =>
          try fs.delete(target, false) catch { case _: Exception => () }
          throw e
      }
    }
  }

  /** Temp+rename so a torn write can never be read as a (wrong)
    * complete object. Throws on failure — the caller decides whether
    * the write was load-bearing (vacuum's pin) or best-effort (the
    * cadence checkpoint).
    */
  override def overwrite(target: Path, body: Array[Byte]): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.tmp-$tag")
    val out = fs.create(tmp, true)
    try {
      try out.write(body) finally out.close()
      if (!fs.rename(tmp, target) && !fs.exists(target))
        throw new java.io.IOException(s"overwrite rename failed for $target")
    } finally { try fs.delete(tmp, false) catch { case _: Exception => () } }
  }

  override def read(p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  override def exists(p: Path): Boolean = fs.exists(p)

  override def list(dir: Path): Seq[String] =
    try fs.listStatus(dir).map(_.getPath.getName).toSeq
    catch { case _: java.io.FileNotFoundException => Nil }

  override def mtime(p: Path): Long = fs.getFileStatus(p).getModificationTime

  override def delete(p: Path): Unit = {
    fs.delete(p, false); ()
  }

  override def mkdirs(dir: Path): Unit = {
    fs.mkdirs(dir); ()
  }
}

/** In-memory OBJECT-STORE emulator with S3-class semantics: immutable
  * whole objects swapped atomically, conditional put (`If-None-Match:
  * *` ⇒ [[putIfAbsent]] via ConcurrentHashMap.putIfAbsent — exactly
  * one winner under any interleaving, the loser's bytes never land),
  * prefix LIST, no directories, no rename. A reader can NEVER observe
  * a torn object: values are private copies installed by one atomic
  * map operation.
  *
  * Shared across writer instances in tests the way a bucket is shared
  * across writers in production — TxnSpec races whole Snapshots
  * writers on one instance and asserts single-winner + intact bytes.
  * `hook` fires with ("putIfAbsent"|"overwrite", path) BEFORE the
  * mutation lands, for crash-injection tests.
  */
final class InMemoryObjectStore(
    hook: (String, String) => Unit = (_, _) => ()) extends LogStore {

  private case class Obj(bytes: Array[Byte], mtime: Long)
  private val objects = new java.util.concurrent.ConcurrentHashMap[String, Obj]()

  private def key(p: Path): String = p.toUri.getPath

  override def putIfAbsent(path: Path, body: Array[Byte]): Boolean = {
    hook("putIfAbsent", key(path))
    objects.putIfAbsent(key(path),
      Obj(body.clone(), System.currentTimeMillis())) == null
  }

  override def overwrite(path: Path, body: Array[Byte]): Unit = {
    hook("overwrite", key(path))
    objects.put(key(path), Obj(body.clone(), System.currentTimeMillis()))
    ()
  }

  override def read(path: Path): Array[Byte] = {
    val o = objects.get(key(path))
    if (o == null) throw new java.io.FileNotFoundException(key(path))
    o.bytes.clone()
  }

  override def exists(path: Path): Boolean = objects.containsKey(key(path))

  override def list(dir: Path): Seq[String] = {
    val prefix = key(dir).stripSuffix("/") + "/"
    import scala.jdk.CollectionConverters._
    objects.keySet.asScala.toSeq.collect {
      case k if k.startsWith(prefix) && !k.substring(prefix.length).contains("/") =>
        k.substring(prefix.length)
    }
  }

  override def mtime(path: Path): Long = {
    val o = objects.get(key(path))
    if (o == null) throw new java.io.FileNotFoundException(key(path))
    o.mtime
  }

  override def delete(path: Path): Unit = {
    objects.remove(key(path)); ()
  }

  override def mkdirs(dir: Path): Unit = () // object stores have no dirs

  /** Test visibility: number of stored objects. */
  def size: Int = objects.size
}
