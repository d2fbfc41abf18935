package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch-id directory protocol shared by the streaming operators'
  * OUTPUT sides (StreamGapFill / StreamNearDedup / StreamLineDedup
  * emissions).
  *
  * Layout under a root: `batch_<id>` dirs, one per micro-batch
  * (overwritten on replay → effectively-once), plus a logarithmic
  * chain of `compact_<id>[.<floor>]` dirs, each holding the merged
  * contents of every batch id in `(floor, id]` (`floor` omitted when
  * -1, i.e. the compact covers everything below it). Without
  * consolidation a year-long stream makes any downstream read list
  * tens of thousands of directories — the same small-file pathology
  * the batch [[graft.sinks.Compaction]] exists to fix — so callers
  * invoke [[consolidate]] every K batches, exactly as the operators'
  * STATE sides already do.
  *
  * Consolidation is TIERED (the classic logarithmic method): each
  * call folds only the batch dirs above the newest compact into a new
  * compact, then absorbs older compacts geometrically — the newest
  * existing compact joins the merge whenever its covered width is at
  * most the accumulated width being written (a binary-counter merge
  * schedule). Every row is therefore rewritten O(log T) times over a
  * T-batch stream (not O(T/K) as a single ever-growing compact would
  * be) and at most O(log T) compacts coexist. StreamGapFill's dense
  * daily emissions are the motivating case: an ever-growing series
  * re-merged on every consolidation is O(T²/K) lifetime I/O.
  *
  * Replay safety: consolidation at batch N only covers ids < N, and a
  * checkpointed stream only ever replays its newest uncommitted batch,
  * so a replayed batch N still overwrites its own `batch_N` (never a
  * consolidated id) and reproduces its increment byte-for-byte. The
  * compact target is keyed by the newest id it covers AND the floor it
  * stops at, making a replayed consolidation idempotent: if the target
  * is complete it only re-runs the (idempotent) cleanup — the floor in
  * the name identifies exactly which absorbed inputs to sweep; if
  * half-written (no `_SUCCESS`) it is rebuilt from its still-present
  * inputs (inputs are deleted only after a successful write, and the
  * rebuild recomputes the same input set from the unchanged listing).
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
      .flatMap(st => parseId(st.getPath.getName, prefix)
        .map(_ -> st.getPath.toString))
      .sortBy(_._1)
  }

  /** Complete compact dirs as (id, floor, path) ascending by id. */
  private def listCompacts(fs: FileSystem,
                           root: Path): Seq[(Long, Long, String)] = {
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("compact_"))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .filter(st => hasParquetFile(fs, st.getPath))
      .flatMap { st =>
        parseCompact(st.getPath.getName)
          .map { case (id, fl) => (id, fl, st.getPath.toString) }
      }
      .sortBy(_._1)
  }

  /** `compact_<id>` → (id, -1); `compact_<id>.<floor>` → (id, floor). */
  private def parseCompact(name: String): Option[(Long, Long)] = {
    val s = name.stripPrefix("compact_")
    val (idPart, floorPart) = s.indexOf('.') match {
      case -1 => (s, "-1")
      case i  => (s.substring(0, i), s.substring(i + 1))
    }
    try Some((idPart.toLong, floorPart.toLong))
    catch { case _: NumberFormatException => None }
  }

  private def parseId(name: String, prefix: String): Option[Long] = {
    if (prefix == "compact_") parseCompact(name).map(_._1)
    else {
      try Some(name.stripPrefix(prefix).toLong)
      catch { case _: NumberFormatException => None }
    }
  }

  private def compactName(id: Long, floor: Long): String =
    if (floor < 0) s"compact_$id" else s"compact_$id.$floor"

  /** The effective tiled chain: walking from the newest compact down,
    * keep a compact only if its id is at or below the floor of the
    * last kept one. Filters out absorbed-but-not-yet-swept inputs (a
    * consolidation crashed between its write and its deletes) whose
    * content a newer compact already contains — reading both would
    * double-count.
    */
  private def tiledChain(
      cs: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] = {
    var bound = Long.MaxValue
    val kept = scala.collection.mutable.ListBuffer.empty[(Long, Long, String)]
    cs.sortBy(-_._1).foreach { c =>
      if (c._1 <= bound) { kept.prepend(c); bound = c._2 }
    }
    kept.toSeq
  }

  def hasParquetFile(fs: FileSystem, dir: Path): Boolean = {
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }

  /** The current read set: the tiled compact chain plus every
    * per-batch dir above its head, as (effective id, path) ascending.
    */
  def current(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val (fs, path) = fsOf(spark, root)
    val chain = tiledChain(listCompacts(fs, path))
    val floor = chain.lastOption.map(_._1).getOrElse(-1L)
    chain.map(c => (c._1, c._3)) ++ list(fs, path, "batch_").filter(_._1 > floor)
  }

  /** Read set strictly before `batchId` — the prior-state view used by
    * operators whose state also lives in this layout.
    */
  def before(spark: SparkSession, root: String,
             batchId: Long): Seq[(Long, String)] = {
    val (fs, path) = fsOf(spark, root)
    val chain = tiledChain(listCompacts(fs, path).filter(_._1 < batchId))
    val floor = chain.lastOption.map(_._1).getOrElse(-1L)
    chain.map(c => (c._1, c._3)) ++ list(fs, path, "batch_")
      .filter { case (id, _) => id > floor && id < batchId }
  }

  /** Tiered consolidation at `upTo`: fold the batch dirs above the
    * newest compact (and below `upTo`) into `compact_<upTo-1>`,
    * absorbing older compacts per the geometric rule in the class doc.
    * Then delete the merged inputs, plus any leaked dirs the new
    * compact covers — the crash-sweep for a consolidation killed
    * between its write and its deletes. The sweep enumerates RAW
    * directory names by parsed id (no `_SUCCESS`/parquet completeness
    * filter), so marker-only dirs from zero-row batches and
    * half-written leftovers at or below the floor are also removed
    * instead of accumulating and being re-listed forever.
    *
    * `merge` sees the union of the inputs and returns what the compact
    * dir should hold — identity for append-only outputs, a latest-wins
    * resolve for corrected ones. Each input carries its effective id
    * in `idCol` while merging (dropped if `merge` drops it); absorbed
    * compacts are stamped with the newest id they cover, lower than
    * any live batch dir, so a later correction still wins.
    */
  def consolidate(spark: SparkSession, root: String, upTo: Long,
                  merge: DataFrame => DataFrame = identity,
                  idCol: Option[String] = None,
                  partitionCols: Seq[String] = Nil): Unit = {
    val (fs, path) = fsOf(spark, root)
    val covered = upTo - 1

    /** Raw dirs with the prefix, as (id, path): NO completeness
      * filter — this enumerates sweep candidates, not read inputs.
      */
    def raw(prefix: String): Seq[(Long, Path)] = {
      if (!fs.exists(path)) return Nil
      fs.listStatus(path).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .flatMap(st => parseId(st.getPath.getName, prefix).map(_ -> st.getPath))
    }

    def cleanup(floor: Long): Unit = {
      raw("batch_").filter(_._1 <= covered)
        .foreach { case (_, d) => fs.delete(d, true) }
      raw("compact_").filter { case (id, _) => id > floor && id < covered }
        .foreach { case (_, d) => fs.delete(d, true) }
    }

    // complete target from a prior (possibly crashed-after-write)
    // attempt: its name records the floor — re-run only the sweep.
    // Completeness here is the _SUCCESS marker ALONE, not parquet
    // presence: a merge callback may legitimately map non-empty
    // inputs to zero rows, leaving a marker-only compact; requiring
    // a parquet file would make that compact unrecognizable once its
    // inputs are swept, and the covered range would be lost
    fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("compact_"))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(st => parseCompact(st.getPath.getName))
      .find(_._1 == covered) match {
      case Some((_, floor)) => cleanup(floor); return
      case None             =>
    }

    val chain = tiledChain(listCompacts(fs, path).filter(_._1 < upTo))
    val newestId = chain.lastOption.map(_._1).getOrElse(-1L)
    val batches = list(fs, path, "batch_")
      .filter { case (id, _) => id > newestId && id < upTo }
    if (batches.isEmpty) return // compact-merging piggybacks on new data

    // geometric absorb: binary-counter merge schedule over covered widths
    var acc = covered - newestId
    var keep = chain.size
    while (keep > 0 && chain(keep - 1)._1 - chain(keep - 1)._2 <= acc) {
      acc += chain(keep - 1)._1 - chain(keep - 1)._2
      keep -= 1
    }
    val absorbed = chain.drop(keep)
    val newFloor = if (keep > 0) chain(keep - 1)._1 else -1L
    val inputs = absorbed.map(c => (c._1, c._3)) ++ batches
    if (inputs.size <= 1) return

    // a half-written same-id target from an interrupted attempt may
    // carry a stale floor in its name — clear any id collision first
    raw("compact_").filter(_._1 == covered)
      .foreach { case (_, d) => fs.delete(d, true) }
    val target = new Path(path, compactName(covered, newFloor))
    val unioned = inputs.map { case (id, d) =>
      val df = spark.read.parquet(d)
      idCol.fold(df)(c => df.withColumn(c,
        org.apache.spark.sql.functions.lit(id)))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val writer = merge(unioned).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(target.toString)
    cleanup(newFloor)
  }

  /** PARTITION-KEYED consolidation — the alternative to the tiered
    * compact chain for DENSE APPEND-MOSTLY series (StreamGapFill's
    * per-day output is the motivating case). Instead of folding batch
    * dirs into ever-wider `compact_*` dirs — where the binary-counter
    * schedule still periodically rewrites the whole series — the merged
    * rows land in a `parts/` subtree partitioned by `partCol`, written
    * with DYNAMIC partition overwrite: only the partitions the merged
    * batches actually touch are rewritten. A ten-year daily series that
    * only ever corrects the trailing lateness window rewrites a bounded
    * set of day partitions per consolidation, never the history.
    *
    * `merge` receives the union of the new batch dirs (each row
    * stamped with its batch id in `idCol`), PLUS the existing rows of
    * the touched partitions (their stored `idCol` preserved), and must
    * return one resolved row set that KEEPS `idCol` — the stored id is
    * what makes a crash-interrupted consolidation self-healing: batch
    * dirs are deleted only after the staged partitions are moved into
    * place, so a crash leaves them in place and the next consolidation
    * re-merges them into the same latest-wins result (duplicates
    * collapse in `merge`). Absorbs and sweeps any legacy `compact_*`
    * dirs below `upTo`, so a stream can migrate modes in place.
    *
    * Two-phase write: the merged rows (new batches + the current
    * content of every touched partition) are written `partitionBy
    * (partCol)` to a `parts_stage_<upTo>` dir, then each staged
    * partition dir replaces its counterpart under `parts/` by
    * delete+rename. Writing the union to a stage first (a) sidesteps
    * Spark's cannot-overwrite-a-read-path rule for `parts/`, and (b)
    * makes a crash recoverable with no data loss: a complete
    * (`_SUCCESS`) stage holds old+new rows of every touched partition,
    * so [[recoverStage]] just finishes the moves; an incomplete stage
    * is discarded (the untouched `parts/` and still-present batch dirs
    * reproduce it).
    */
  def consolidatePartitioned(spark: SparkSession, root: String, upTo: Long,
                             partCol: String,
                             merge: DataFrame => DataFrame,
                             idCol: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val (fs, path) = fsOf(spark, root)
    val partsRoot = new Path(path, "parts")
    recoverStage(fs, path, partsRoot, partCol)
    val inputs = before(spark, root, upTo)
    if (inputs.isEmpty) return
    val fresh = inputs.map { case (id, d) =>
      spark.read.parquet(d).withColumn(idCol, lit(id))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val existing =
      if (hasPartitionDirs(fs, partsRoot, partCol))
        Some(spark.read.parquet(partsRoot.toString)
          .join(broadcast(fresh.select(partCol).distinct()),
            Seq(partCol), "left_semi"))
      else None
    val merged = merge(existing.fold(fresh)(e =>
      fresh.unionByName(e, allowMissingColumns = true)))
    val stage = new Path(path, s"parts_stage_$upTo")
    merged.write.mode("overwrite").partitionBy(partCol).parquet(stage.toString)
    moveStagedPartitions(fs, stage, partsRoot, partCol)
    // sweep AFTER the moves: raw listing (no completeness filter) so
    // marker-only zero-row batches and half-written leftovers go too
    if (fs.exists(path)) fs.listStatus(path).toSeq
      .filter(st => st.isDirectory)
      .foreach { st =>
        val n = st.getPath.getName
        val swept =
          (n.startsWith("batch_") && parseId(n, "batch_").exists(_ < upTo)) ||
          (n.startsWith("compact_") && parseCompact(n).exists(_._1 < upTo))
        if (swept) fs.delete(st.getPath, true)
      }
  }

  /** Replace each `partCol=...` dir under `partsRoot` with its staged
    * counterpart, then drop the stage. Idempotent: re-running after a
    * partial pass moves only the partitions still in the stage.
    */
  private def moveStagedPartitions(fs: FileSystem, stage: Path,
                                   partsRoot: Path, partCol: String): Unit = {
    fs.mkdirs(partsRoot)
    fs.listStatus(stage).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
      .foreach { st =>
        val dest = new Path(partsRoot, st.getPath.getName)
        if (fs.exists(dest)) fs.delete(dest, true)
        if (!fs.rename(st.getPath, dest))
          throw new java.io.IOException(s"rename ${st.getPath} -> $dest failed")
      }
    fs.delete(stage, true)
  }

  /** Crash recovery for [[consolidatePartitioned]]: finish the moves of
    * a complete stage, discard an incomplete one.
    */
  private def recoverStage(fs: FileSystem, path: Path, partsRoot: Path,
                           partCol: String): Unit = {
    if (!fs.exists(path)) return
    fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("parts_stage_"))
      .foreach { st =>
        if (fs.exists(new Path(st.getPath, "_SUCCESS")))
          moveStagedPartitions(fs, st.getPath, partsRoot, partCol)
        else fs.delete(st.getPath, true)
      }
  }

  /** At least one materialized `partCol=...` partition dir (ignores
    * `_temporary` et al. from a crashed write, whose content
    * `spark.read` would not see either).
    */
  private def hasPartitionDirs(fs: FileSystem, partsRoot: Path,
                               partCol: String): Boolean =
    fs.exists(partsRoot) && fs.listStatus(partsRoot).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(partCol + "="))

  /** Read set for the partition-keyed layout: the `parts/` subtree
    * (rows carry their stored `idCol`) plus every live batch/compact
    * dir, stamped per [[read]]. Empty-safe only if something exists.
    * Finishes any interrupted stage first — mid-move, a touched
    * partition's pre-merge rows exist only in the stage, and keys that
    * happened to share the partition without appearing in the merged
    * batches would otherwise be invisible.
    */
  def readPartitioned(spark: SparkSession, root: String, partCol: String,
                      idCol: String): DataFrame = {
    val (fs, path) = fsOf(spark, root)
    val partsRoot = new Path(path, "parts")
    recoverStage(fs, path, partsRoot, partCol)
    val live = current(spark, root).map { case (id, d) =>
      spark.read.parquet(d)
        .withColumn(idCol, org.apache.spark.sql.functions.lit(id))
    }
    val parts =
      if (hasPartitionDirs(fs, partsRoot, partCol))
        Seq(spark.read.parquet(partsRoot.toString))
      else Nil
    val all = parts ++ live
    require(all.nonEmpty, s"no output under $root")
    all.reduce(_.unionByName(_, allowMissingColumns = true))
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
