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

  case class Stats(filesBefore: Long, filesAfter: Long,
                   rowsBefore: Long, rowsAfter: Long)

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
}
