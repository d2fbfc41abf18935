package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch-id directory protocol shared by the streaming operators'
  * OUTPUT sides (StreamGapFill / StreamNearDedup / StreamLineDedup
  * emissions).
  *
  * Layout under a root: `batch_<id>` dirs, one per micro-batch
  * (overwritten on replay → effectively-once), plus at most a couple
  * of `compact_<c>` dirs, each holding the merged contents of every
  * batch id <= c. Without consolidation a year-long stream makes any
  * downstream read list tens of thousands of directories — the same
  * small-file pathology the batch [[graft.sinks.Compaction]] exists to
  * fix — so callers invoke [[consolidate]] every K batches, exactly as
  * the operators' STATE sides already do.
  *
  * Replay safety: consolidation at batch N only covers ids < N, and a
  * checkpointed stream only ever replays its newest uncommitted batch,
  * so a replayed batch N still overwrites its own `batch_N` (never a
  * consolidated id) and reproduces its increment byte-for-byte. The
  * compact target is keyed by the newest id it covers, making a
  * replayed consolidation idempotent: if the target is complete it
  * only re-runs the (idempotent) cleanup; if half-written (no
  * `_SUCCESS`) it is rebuilt from its still-present inputs.
  */
object BatchDirs {

  def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val path = new Path(dir)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** Complete (`_SUCCESS`-marked, >=1 parquet file) dirs with the
    * given prefix, as (id, path) ascending. Marker-only dirs (a batch
    * that emitted zero rows) are skipped — `spark.read.parquet` cannot
    * infer a schema from them and they contribute nothing.
    */
  def list(fs: FileSystem, root: Path, prefix: String): Seq[(Long, String)] = {
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .filter(st => hasParquetFile(fs, st.getPath))
      .map(st => st.getPath.getName.stripPrefix(prefix).toLong -> st.getPath.toString)
      .sortBy(_._1)
  }

  def hasParquetFile(fs: FileSystem, dir: Path): Boolean = {
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }

  /** The current read set: the newest compact dir (effective id = the
    * newest batch it covers) plus every per-batch dir above it, as
    * (effective id, path) ascending.
    */
  def current(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val (fs, path) = fsOf(spark, root)
    val newest = list(fs, path, "compact_").lastOption
    val floor = newest.map(_._1).getOrElse(-1L)
    newest.toSeq ++ list(fs, path, "batch_").filter(_._1 > floor)
  }

  /** Read set strictly before `batchId` — the prior-state view used by
    * operators whose state also lives in this layout.
    */
  def before(spark: SparkSession, root: String,
             batchId: Long): Seq[(Long, String)] = {
    val (fs, path) = fsOf(spark, root)
    val newest = list(fs, path, "compact_").filter(_._1 < batchId).lastOption
    val floor = newest.map(_._1).getOrElse(-1L)
    newest.toSeq ++ list(fs, path, "batch_")
      .filter { case (id, _) => id > floor && id < batchId }
  }

  /** Merge every dir covering ids < `upTo` into `compact_<upTo-1>`,
    * then delete the merged inputs (plus any leaked dirs at or below
    * the new floor — the crash-sweep for a consolidation killed
    * between its write and its deletes). `merge` sees the union of the
    * inputs and returns what the compact dir should hold — identity
    * for append-only outputs, a latest-wins resolve for corrected
    * ones. Each input carries its effective id in `idCol` while
    * merging (dropped if `merge` drops it).
    */
  def consolidate(spark: SparkSession, root: String, upTo: Long,
                  merge: DataFrame => DataFrame = identity,
                  idCol: Option[String] = None,
                  partitionCols: Seq[String] = Nil): Unit = {
    val (fs, path) = fsOf(spark, root)
    val covered = upTo - 1
    val target = new Path(path, s"compact_$covered")

    def cleanup(): Unit = {
      list(fs, path, "batch_").filter(_._1 <= covered)
        .foreach { case (_, d) => fs.delete(new Path(d), true) }
      list(fs, path, "compact_").filter(_._1 < covered)
        .foreach { case (_, d) => fs.delete(new Path(d), true) }
    }

    if (fs.exists(new Path(target, "_SUCCESS"))) { cleanup(); return }
    val inputs = before(spark, root, upTo)
    if (inputs.size <= 1) return
    val unioned = inputs.map { case (id, d) =>
      val df = spark.read.parquet(d)
      idCol.fold(df)(c => df.withColumn(c,
        org.apache.spark.sql.functions.lit(id)))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val writer = merge(unioned).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(target.toString)
    cleanup()
  }

  /** Union of the current read set, each dir stamped with its
    * effective id in `idCol` when given (a compact dir's rows carry
    * the newest id it covers — lower than any live batch dir, so a
    * later correction still wins a latest-wins resolve).
    */
  def read(spark: SparkSession, root: String,
           idCol: Option[String] = None): DataFrame = {
    val dirs = current(spark, root)
    require(dirs.nonEmpty, s"no output batches under $root")
    dirs.map { case (id, d) =>
      val df = spark.read.parquet(d)
      idCol.fold(df)(c => df.withColumn(c,
        org.apache.spark.sql.functions.lit(id)))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
