package graft

import java.net.URI
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A NON-local Hadoop FileSystem backed by the local disk: scheme
  * `mockfs`, every operation delegated to [[RawLocalFileSystem]] with
  * the scheme swapped. `Snapshot.isLocalFs` sees neither
  * LocalFileSystem nor RawLocalFileSystem, so commits take the
  * O_EXCL-create + body-flush claim path with the TornGraceMs
  * discipline — the path HDFS/object stores take (VERDICT r19 next
  * #6: previously tested only implicitly). One-shot static fault
  * hooks inject the two races that path guards:
  *
  *  - [[MockRemoteFs.tornNextManifestBody]]: the next manifest create
  *    lands the claim file but its body writes are DISCARDED (writer
  *    crashed between O_EXCL create and flush) — a torn tombstone.
  *  - [[MockRemoteFs.onManifestClose]]: runs after the next manifest
  *    body flushes, BEFORE the committer's supersession re-check —
  *    the window where a racer that aged us as torn claims past us.
  *
  * Test-only. Register with
  * `hadoopConf.set("fs.mockfs.impl", classOf[MockRemoteFs].getName)`.
  */
class MockRemoteFs extends FileSystem {
  private val local = new RawLocalFileSystem()
  private var myUri: URI = URI.create("mockfs:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    local.initialize(URI.create("file:///"), conf)
    myUri = URI.create("mockfs:///")
    setConf(conf)
  }

  override def getScheme: String = "mockfs"
  override def getUri: URI = myUri

  private def toLocal(p: Path): Path =
    new Path("file", null, p.toUri.getPath)
  // a FRESH eager status: mutating the delegate's status path would
  // poison RawLocal's lazy permission loading (it re-resolves its own
  // path as a java.io.File)
  private def toMock(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      st.getPermission, st.getOwner, st.getGroup,
      new Path("mockfs", null, st.getPath.toUri.getPath))
  private def isManifest(p: Path): Boolean =
    p.getName.startsWith("manifest-") && p.getName.endsWith(".json") &&
      p.getParent != null && p.getParent.getName == "_graft_manifests"

  override def open(p: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(p), bufferSize)

  override def create(p: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val out = local.create(toLocal(p), permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (!isManifest(p)) return out
    if (MockRemoteFs.tornNextManifestBody.compareAndSet(true, false)) {
      // claim landed (file exists — O_EXCL succeeded), body never
      // flushes: the crashed-writer torn window
      out.close()
      return new FSDataOutputStream(new java.io.OutputStream {
        override def write(b: Int): Unit = ()
        override def write(b: Array[Byte], off: Int, len: Int): Unit = ()
      }, null)
    }
    val hook = MockRemoteFs.onManifestClose.getAndSet(null)
    if (hook == null) return out
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = { super.close(); hook.accept(p) }
    }, null)
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(p), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(p: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(p), recursive)

  override def listStatus(p: Path): Array[FileStatus] =
    local.listStatus(toLocal(p)).map(toMock)

  override def setWorkingDirectory(p: Path): Unit =
    local.setWorkingDirectory(toLocal(p))

  override def getWorkingDirectory: Path =
    new Path("mockfs", null, local.getWorkingDirectory.toUri.getPath)

  override def mkdirs(p: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(p), permission)

  override def getFileStatus(p: Path): FileStatus =
    toMock(local.getFileStatus(toLocal(p)))
}

object MockRemoteFs {
  /** One-shot: discard the body of the next manifest create. */
  val tornNextManifestBody = new AtomicBoolean(false)

  /** One-shot: invoked with the manifest path right after its body
    * flush completes — before the committer re-checks for racers.
    */
  val onManifestClose =
    new AtomicReference[java.util.function.Consumer[Path]](null)
}
