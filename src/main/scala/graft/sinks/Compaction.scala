package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for parquet table directories — the
  * maintenance operation an incremental CDC sink needs at scale:
  * every micro-batch write lands a few small files per partition, and
  * after thousands of batches the scan cost is dominated by file
  * opens and footer reads, not data. (The reference leaves this to
  * the consumer; at 100 TB it is part of the table's lifecycle.)
  *
  * Rewrite = one distributed read of the directory → write with
  * `maxRecordsPerFile` (and the original hive-style partition
  * columns, so partition pruning is unchanged) into a sibling temp
  * directory → atomic-ish swap (old dir moved aside, temp renamed in,
  * old deleted). Readers racing the swap see either the old or the
  * new complete directory on a filesystem with atomic rename; on
  * object stores, run it in a maintenance window like every other
  * rewrite job.
  */
object Compaction {

  /** `version` is the committed version a versioned rewrite produced
    * (-1 for the in-place [[compact]], which has no version chain).
    */
  case class Stats(filesBefore: Long, filesAfter: Long,
                   rowsBefore: Long, rowsAfter: Long,
                   version: Long = -1L)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[Path] = {
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) buf += f.getPath
    }
    buf.toSeq
  }

  /** Compact `dir` to files of at most `maxRecordsPerFile` rows,
    * preserving the given hive partition columns (empty = flat dir).
    * Returns before/after stats; rows are recounted from the
    * rewritten directory as a guard before the old data is deleted.
    */
  def compact(spark: SparkSession, dir: String,
              maxRecordsPerFile: Long,
              partitionCols: Seq[String] = Nil,
              codec: String = "snappy"): Stats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"compaction target $dir does not exist")
    val before = dataFiles(fs, path)
    val df = spark.read.parquet(dir)
    val rowsBefore = df.count()

    val tmp = new Path(path.getParent, path.getName + ".compact-tmp")
    val bak = new Path(path.getParent, path.getName + ".compact-old")
    fs.delete(tmp, true); fs.delete(bak, true)
    // partitioned: one task per partition dir (maxRecordsPerFile
    // splits oversized ones); flat: size the task count from the data
    val reshaped =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        math.max(1, math.ceil(rowsBefore.toDouble / maxRecordsPerFile).toInt))
    val writer = reshaped
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)

    // guard 1: the rewrite must contain every row before the swap
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    require(rowsAfter == rowsBefore,
      s"compaction row mismatch for $dir: $rowsBefore -> $rowsAfter; aborting (tmp kept)")
    // guard 2: a writer racing the compaction (a micro-batch landing a
    // new file after the read snapshot) would be silently deleted by
    // the swap — abort instead and let the caller retry in a quiet
    // window
    val nowFiles = dataFiles(fs, path).map(_.toString).toSet
    require(nowFiles == before.map(_.toString).toSet,
      s"$dir changed during compaction (concurrent writer); aborting, directory untouched")

    require(fs.rename(path, bak), s"could not move $path aside")
    if (!fs.rename(tmp, path)) { // restore on failure
      fs.rename(bak, path)
      throw new java.io.IOException(s"could not swap compacted data into $path")
    }
    fs.delete(bak, true)
    Stats(before.size.toLong, dataFiles(fs, path).size.toLong, rowsBefore, rowsAfter)
  }

  // ------------- lock-free compaction on a versioned root -------------

  private def versionData(dir: Path) = new Path(dir, "data")

  /** Data directory of a committed version — THE layout authority for
    * anything that reads a versioned root from outside this object
    * (e.g. [[graft.operators.SkippingIndex.readVersioned]]); a layout
    * change here propagates instead of silently breaking callers that
    * would otherwise hardcode the `v<n>/data` shape.
    */
  def dataPathFor(rootPath: Path, version: Long): Path =
    versionData(TableVersions.dataDir(rootPath, version))

  /** Current committed (version, data path) of a [[TableVersions]]
    * root written by [[writeVersioned]]/[[compactVersioned]].
    */
  def currentData(spark: SparkSession, root: String): Option[(Long, String)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    TableVersions.current(fs, rootPath).map(v =>
      v -> versionData(TableVersions.dataDir(rootPath, v)).toString)
  }

  /** Read the current committed snapshot. */
  def readCurrent(spark: SparkSession, root: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(currentData(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed version under $root"))._2)

  /** TIME TRAVEL: read a specific committed snapshot of the chain.
    * Every version [[compactVersioned]]/[[writeVersioned]] has not yet
    * pruned stays readable — the audit/debug/reproducibility read the
    * pointer-file table formats expose as `VERSION AS OF`. Fails with
    * the available versions when `version` is gone or never existed.
    */
  def readVersion(spark: SparkSession, root: String,
                  version: Long): org.apache.spark.sql.DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = TableVersions.committedVersions(fs, rootPath)
    require(committed.contains(version),
      s"v$version is not a committed version of $root " +
        s"(available: ${committed.map("v" + _).mkString(", ")})")
    spark.read.parquet(versionData(TableVersions.dataDir(rootPath, version)).toString)
  }

  /** Write `df` as the next committed snapshot of `root`; returns the
    * new version. The initial load and every rewrite use the same
    * path: data lands complete under `v<n>/data`, then the marker
    * commit makes it visible.
    */
  def writeVersioned(df: org.apache.spark.sql.DataFrame, root: String,
                     maxRecordsPerFile: Long = Long.MaxValue,
                     partitionCols: Seq[String] = Nil,
                     codec: String = "snappy"): Long = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val pending = TableVersions.begin(fs, rootPath)
    val writer = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(versionData(pending.dir).toString)
    TableVersions.commit(fs, rootPath, pending)
    pending.version
  }

  /** Compact the current snapshot of a versioned root into the next
    * version — the lock-free form of [[compact]]: racing readers
    * resolve a committed version and read a directory that is never
    * moved or deleted out from under them (old versions survive until
    * `keepHistory` commits later), and the new data only becomes
    * visible at the marker commit. The row-count guard still runs
    * before the commit, and a writer committing a newer version while
    * the compaction ran aborts it (the compacted copy would be stale).
    */
  def compactVersioned(spark: SparkSession, root: String,
                       maxRecordsPerFile: Long,
                       partitionCols: Seq[String] = Nil,
                       codec: String = "snappy",
                       keepHistory: Int = 2): Stats = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (baseVersion, dataPath) = currentData(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed version under $root"))
    val before = dataFiles(fs, new Path(dataPath))
    val df = spark.read.parquet(dataPath)
    val rowsBefore = df.count()

    val pending = TableVersions.begin(fs, rootPath)
    val reshaped =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        math.max(1, math.ceil(rowsBefore.toDouble / maxRecordsPerFile).toInt))
    val writer = reshaped.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(versionData(pending.dir).toString)

    val rowsAfter = spark.read.parquet(versionData(pending.dir).toString).count()
    require(rowsAfter == rowsBefore,
      s"compaction row mismatch for $root: $rowsBefore -> $rowsAfter; aborting (uncommitted)")
    require(TableVersions.current(fs, rootPath).contains(baseVersion),
      s"$root advanced past v$baseVersion during compaction (concurrent writer); " +
        "aborting, nothing published")
    TableVersions.commit(fs, rootPath, pending)
    TableVersions.prune(fs, rootPath, keepHistory)
    // commit RENAMED the staging dir into place — count the published files
    val published = versionData(TableVersions.dataDir(rootPath, pending.version))
    Stats(before.size.toLong,
      dataFiles(fs, published).size.toLong, rowsBefore, rowsAfter,
      version = pending.version)
  }
}
