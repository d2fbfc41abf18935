package graft.sinks

import java.util.UUID

import scala.util.Try

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Lock-free snapshot-chain commits for versioned table directories —
  * the minimal form of the pointer-file pattern table formats use
  * (Iceberg's version-hint, Delta's _last_checkpoint): data for
  * version `n` is fully written under `root/v<n>/`, then a commit
  * marker makes it visible, then a best-effort `VERSION` hint file is
  * swapped in atomically for cheap lookup.
  *
  * Readers resolve the current version from the committed markers
  * (authoritative — the hint is advisory), so a crash between data
  * write and commit leaves an invisible version directory that the
  * next [[begin]] reclaims, and a crash between marker and hint is
  * harmless. Racing readers always see a complete committed
  * directory; old versions stay readable until [[prune]] — callers
  * retain enough history to cover in-flight reads.
  *
  * Writers are expected to be SINGLE at a time (one compaction job,
  * one streaming driver). That assumption is additionally fenced:
  * [[begin]] stamps the reserved directory with a unique writer
  * token, and [[commit]] refuses to publish unless the token still
  * matches — so a zombie writer whose reservation was taken over by a
  * newer writer (failover) cannot drop the commit marker into the new
  * writer's half-written directory.
  *
  * Shared by [[Compaction.compactVersioned]] (lock-free swap) and
  * [[graft.streaming.BucketedCdcState]] (incremental bucketed state).
  */
object TableVersions {

  private val HintFile = "VERSION"
  private val Marker = "_GRAFT_COMMITTED"
  private val WriterToken = "_GRAFT_WRITER"
  private val DirPattern = "^v(\\d+)$".r

  /** A reserved, not-yet-committed version. `token` fences the commit
    * against a takeover by a newer writer.
    */
  case class Pending(version: Long, dir: Path, token: String)

  def dataDir(root: Path, version: Long): Path = new Path(root, s"v$version")

  private def isCommitted(fs: FileSystem, root: Path, v: Long): Boolean =
    fs.exists(new Path(dataDir(root, v), Marker))

  /** All committed versions, ascending. */
  def committedVersions(fs: FileSystem, root: Path): Seq[Long] = {
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case DirPattern(n) => Some(n.toLong)
        case _             => None
      })
      .filter(v => isCommitted(fs, root, v))
      .sorted
  }

  /** Latest committed version; None before the first commit. The
    * marker scan is authoritative — the VERSION hint may lag by one
    * commit after a crash and is only ever written after the marker.
    */
  def current(fs: FileSystem, root: Path): Option[Long] =
    committedVersions(fs, root).lastOption

  /** Reserve the next version directory: one past the last COMMITTED
    * version. A stale uncommitted leftover at that number (crash
    * before commit) is invisible to every reader and is reclaimed —
    * under the single-writer assumption nothing live is lost, and if
    * a zombie writer still holds the old reservation its commit is
    * fenced off by the token check (it cannot publish OUR directory).
    */
  def begin(fs: FileSystem, root: Path): Pending = {
    fs.mkdirs(root)
    val v = current(fs, root).getOrElse(-1L) + 1
    val dir = dataDir(root, v)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val token = UUID.randomUUID().toString
    val out = fs.create(new Path(dir, WriterToken), false)
    out.write(token.getBytes("UTF-8"))
    out.close()
    Pending(v, dir, token)
  }

  /** Publish a reserved version: verify the directory still carries
    * OUR writer token (fencing — a takeover by a newer writer aborts
    * this commit instead of publishing the other writer's half-written
    * data), then write the commit marker (the atomic visibility
    * point — `create` of a new file), then refresh the advisory hint
    * with an atomic overwrite-rename.
    */
  def commit(fs: FileSystem, root: Path, pending: Pending): Unit = {
    val dir = dataDir(root, pending.version)
    require(fs.exists(dir),
      s"commit of v${pending.version}: directory $dir does not exist (taken over or never begun)")
    require(!isCommitted(fs, root, pending.version),
      s"commit of v${pending.version}: already committed")
    val stamped = readSmall(fs, new Path(dir, WriterToken))
    require(stamped.contains(pending.token),
      s"commit of v${pending.version}: writer token mismatch " +
        s"(${stamped.getOrElse("<missing>")} != ${pending.token}) — " +
        "a newer writer took over this version; aborting")
    val out = fs.create(new Path(dir, Marker), true)
    out.close()
    writeHint(fs, root, pending.version)
  }

  private def writeHint(fs: FileSystem, root: Path, v: Long): Unit = {
    val tmp = new Path(root, s".$HintFile.tmp")
    val hint = new Path(root, HintFile)
    val out = fs.create(tmp, true)
    out.write(v.toString.getBytes("UTF-8"))
    out.close()
    try {
      val fc = FileContext.getFileContext(root.toUri, fs.getConf)
      fc.rename(tmp, hint, Options.Rename.OVERWRITE)
    } catch {
      case _: Exception => // hint is advisory; markers stay authoritative
        fs.delete(tmp, true)
    }
  }

  /** Full small-file read — Hadoop streams may short-read, so loop to
    * EOF (these files are a few bytes).
    */
  private def readSmall(fs: FileSystem, p: Path): Option[String] = Try {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val bytes = new Array[Byte](256)
      var n = in.read(bytes)
      while (n >= 0) {
        buf.write(bytes, 0, n)
        n = in.read(bytes)
      }
      new String(buf.toByteArray, "UTF-8").trim
    } finally in.close()
  }.toOption

  /** Read the advisory hint (diagnostics / external tooling). Corrupt
    * or partial hints degrade to None — the hint is never
    * authoritative.
    */
  def hint(fs: FileSystem, root: Path): Option[Long] =
    readSmall(fs, new Path(root, HintFile))
      .flatMap(s => Try(s.toLong).toOption)

  /** Delete all but the newest `keep` committed versions. Callers
    * size `keep` to cover the longest in-flight read (a version is
    * only unsafe to delete while a reader resolved it before the
    * newer commit).
    */
  def prune(fs: FileSystem, root: Path, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the current version")
    val vs = committedVersions(fs, root)
    vs.dropRight(keep).foreach(v => fs.delete(dataDir(root, v), true))
  }
}
