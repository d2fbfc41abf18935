package graft.sinks

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
  * write and commit leaves an invisible, reusable version directory
  * and a crash between marker and hint is harmless. Racing readers
  * always see a complete committed directory; old versions stay
  * readable until [[prune]] — callers retain enough history to cover
  * in-flight reads.
  *
  * Shared by [[Compaction]] (lock-free swap) and
  * [[graft.streaming.CdcStream]] (incremental bucketed state).
  */
object TableVersions {

  private val HintFile = "VERSION"
  private val Marker = "_GRAFT_COMMITTED"
  private val DirPattern = "^v(\\d+)$".r

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
    * before commit) is invisible to every reader and safe to clear.
    */
  def begin(fs: FileSystem, root: Path): (Long, Path) = {
    fs.mkdirs(root)
    val v = current(fs, root).getOrElse(-1L) + 1
    val dir = dataDir(root, v)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    (v, dir)
  }

  /** Publish version `v`: write the commit marker (the atomic
    * visibility point — `create` of a new file), then refresh the
    * advisory hint with an atomic overwrite-rename.
    */
  def commit(fs: FileSystem, root: Path, v: Long): Unit = {
    val marker = new Path(dataDir(root, v), Marker)
    val out = fs.create(marker, true)
    out.close()
    writeHint(fs, root, v)
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

  /** Read the advisory hint (diagnostics / external tooling). */
  def hint(fs: FileSystem, root: Path): Option[Long] = {
    val p = new Path(root, HintFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](32)
        val n = in.read(bytes)
        val s = new String(bytes, 0, math.max(n, 0), "UTF-8").trim
        if (s.nonEmpty) Some(s.toLong) else None
      } finally in.close()
    }
  }

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
