package graft

import java.net.URI
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local FileSystem that COUNTS listStatus calls — the instrument
  * behind the "reads plan from the manifest alone" assert. Registered
  * under the `cfs:` scheme (fs.cfs.impl); a Snapshots lake rooted at a
  * cfs: path goes through this class for every metadata operation, so a
  * test can prove a snapshot read never lists a data directory (the
  * O(files) driver walk the manifest metadata exists to eliminate).
  */
class CountingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "cfs"
  override def getUri: URI = URI.create("cfs:///")

  override def listStatus(p: Path): Array[FileStatus] = {
    CountingLocalFs.listed.add(p.toUri.getPath)
    super.listStatus(p)
  }

  override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    CountingLocalFs.opened.add(p.toUri.getPath)
    super.open(p, bufferSize)
  }
}

object CountingLocalFs {
  val listed = new ConcurrentLinkedQueue[String]()
  val opened = new ConcurrentLinkedQueue[String]()
  def reset(): Unit = { listed.clear(); opened.clear() }

  /** Distinct DATA files opened (executor scan opens — footer + column
    * reads collapse to one entry per file). The plan-time skipping
    * assert: a file the sidecar stats prune is never opened at all,
    * which survives AQE plan shapes that hide FileSourceScanExec from
    * naive tree collects.
    */
  def dataFileOpens: Seq[String] =
    opened.asScala.filter(_.endsWith(".parquet")).toSeq.distinct

  /** listStatus calls against anything that is NOT the commit log —
    * i.e. actual data-directory listings. The commit log list (one
    * `_commits` dir of manifest pointers) is the O(1)-ish head resolve
    * every snapshot read legitimately pays.
    */
  def dataDirLists: Seq[String] =
    listed.asScala.filterNot(_.contains("_commits")).toSeq
}
