package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Min/max file-skipping index — the read half of the Z-order story.
  *
  * [[ZOrder.write]] lays files out so each covers a small
  * hyper-rectangle of the clustered dimensions; this index persists
  * each file's per-dimension [min,max] envelope as ONE small parquet
  * (rows = files — model-sized at any data scale) and prunes the
  * file list BEFORE the scan is planned. Spark's own footer pruning
  * still works without it, but it opens every footer on every query;
  * the index turns that into one tiny read + a driver-side filter,
  * which is how lakehouse table formats (Delta/Iceberg stats,
  * Hudi col_stats) plan 100 TB scans.
  *
  * Dimensions may be numeric/date/timestamp ([[NumBound]], compared
  * through [[ZOrder.numView]]: timestamps in epoch seconds, DATEs in
  * epoch DAYS) or strings ([[StrBound]], pruned by lexicographic
  * interval intersection over the UTF8 binary order Spark's own
  * min/max and comparison operators share — the Delta/Iceberg
  * col-stats behavior). Types with no practical total order (arrays,
  * maps, structs, binary) are refused at read time.
  *
  * Safety: [[read]] refuses a stale index. The data directory's
  * current parquet file set must equal the indexed set — an appended
  * or compacted file the index has never seen would otherwise be
  * silently skipped (wrong results, not just slow ones). For tables
  * that rewrite, the versioned form ([[buildVersioned]] /
  * [[readVersioned]]) keys each index to a [[graft.sinks.TableVersions]]
  * commit: a version's file set is immutable after its marker commit,
  * so its index stays valid forever (until history pruning), and a
  * compaction RE-POINTS queries at the new version's index instead of
  * invalidating reads of the old one — time travel keeps working.
  */
object SkippingIndex {

  /** A conjunctive per-dimension interval for [[readBounds]]. */
  sealed trait Bound { def dim: String }
  /** Numeric/temporal interval; the column is compared through
    * [[ZOrder.numView]] (timestamps in epoch seconds, DATEs in days
    * since epoch, as elsewhere in the layout API). */
  final case class NumBound(dim: String, lo: Double, hi: Double) extends Bound
  /** Lexicographic string interval, inclusive on both ends. */
  final case class StrBound(dim: String, lo: String, hi: String) extends Bound

  /** An index written INTO the tree it indexes would be listed as
    * data (staleness chaos) — and worse, the overwrite on rebuild
    * would DELETE committed table data if the roots nest the other
    * way. Refuse both nestings up front.
    */
  private def requireDisjoint(dataRoot: String, indexRoot: String): Unit = {
    def norm(p: String) =
      new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")
    val d = norm(dataRoot); val i = norm(indexRoot)
    require(i != d && !i.startsWith(d + "/") && !d.startsWith(i + "/"),
      s"SkippingIndex: index location $indexRoot must be disjoint from " +
        s"the table location $dataRoot — a nested index would be read " +
        "as data, and an index overwrite could delete committed rows")
  }

  /** Build (overwrite) the index for `cols` over `dataPath`. */
  def build(spark: SparkSession, dataPath: String, indexPath: String,
            cols: Seq[String]): Unit = {
    requireDisjoint(dataPath, indexPath)
    ZOrder.fileStats(spark, dataPath, cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath)
  }

  private def dataFiles(spark: SparkSession, dataPath: String): Set[String] = {
    val path = new org.apache.hadoop.fs.Path(dataPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) out += f.toUri.getPath
    }
    out.toSet
  }

  /** Staleness gate shared by every read path. A file the index has
    * never seen is refused UNLESS it holds zero rows: aggregate-built
    * indexes legitimately have no row for an empty part file (a
    * repartition write can emit one), and skipping an empty file
    * cannot change results. The zero-row probe reads ONLY the unknown
    * files — in the normal fresh path the set is empty and nothing is
    * read; after a real append it holds the new data and the require
    * fires.
    */
  private def requireFresh(spark: SparkSession, dataPath: String,
                           indexed: Set[String], rebuildHint: String): Unit = {
    val current = dataFiles(spark, dataPath)
    val gone = indexed -- current
    require(gone.isEmpty,
      s"SkippingIndex: stale index for $dataPath — ${gone.size} indexed " +
        s"file(s) no longer exist (rewrite/compaction); $rebuildHint")
    val unknown = current -- indexed
    if (unknown.nonEmpty) {
      val rows = spark.read.parquet(unknown.toSeq: _*).count()
      require(rows == 0,
        s"SkippingIndex: stale index for $dataPath — ${unknown.size} " +
          s"unindexed file(s) holding $rows rows; $rebuildHint")
    }
  }

  /** Read `dataPath` filtered to the conjunctive numeric `box`,
    * scanning only files whose indexed envelope intersects it. The
    * exact predicate is still applied — pruning is transparent.
    */
  def read(spark: SparkSession, dataPath: String, indexPath: String,
           box: Seq[(String, Double, Double)]): DataFrame =
    readBounds(spark, dataPath, indexPath,
      box.map { case (d, lo, hi) => NumBound(d, lo, hi) })

  /** [[read]] generalized to mixed numeric + string dimensions. */
  def readBounds(spark: SparkSession, dataPath: String, indexPath: String,
                 bounds: Seq[Bound]): DataFrame = {
    val idx = loadIndex(spark, indexPath, bounds)
    val indexed = idx.select("file")
      .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
    requireFresh(spark, dataPath, indexed,
      "rebuild with build() after any write or compaction")
    prunedRead(spark, dataPath, idx, bounds)
  }

  private def loadIndex(spark: SparkSession, indexPath: String,
                        bounds: Seq[Bound]): DataFrame = {
    require(bounds.nonEmpty, "SkippingIndex.read needs at least one bound")
    val idx = spark.read.parquet(indexPath)
    val unindexed = bounds.map(_.dim).filterNot(d =>
      idx.columns.contains(s"min_$d") && idx.columns.contains(s"max_$d"))
    require(unindexed.isEmpty,
      s"SkippingIndex: dimension(s) ${unindexed.mkString(", ")} not in " +
        s"the index at $indexPath (indexed: ${idx.columns.filter(_
          .startsWith("min_")).map(_.stripPrefix("min_")).mkString(", ")})")
    bounds.foreach { b =>
      val t = idx.schema(s"min_${b.dim}").dataType
      b match {
        case _: StrBound => require(t == StringType,
          s"SkippingIndex: StrBound on '${b.dim}' but the indexed type is " +
            s"$t — use NumBound for numeric/temporal dimensions")
        case _: NumBound => t match {
          case _: NumericType | DateType | TimestampType | BooleanType => ()
          case StringType => throw new IllegalArgumentException(
            s"SkippingIndex: dimension(s) ${b.dim} are strings — numeric " +
              "boxes cannot prune them; use StrBound for lexicographic " +
              "pruning, or encode/cast the column before indexing")
          case TimestampNTZType => throw new IllegalArgumentException(
            s"SkippingIndex: dimension '${b.dim}' is TIMESTAMP_NTZ, which " +
              "has no fixed epoch mapping for a NumBound (a double epoch " +
              "would depend on an assumed zone); cast the column to " +
              "TIMESTAMP or to a numeric epoch before indexing")
          case other => throw new IllegalArgumentException(
            s"SkippingIndex: dimension '${b.dim}' has type $other, which " +
              "has no usable total order for envelope pruning")
        }
      }
    }
    idx
  }

  // both conditions compare through ZOrder.numView, keyed by the
  // INDEXED type (the data column has the same type the stats were
  // aggregated from) — a DATE dim prunes in epoch days instead of
  // hitting Spark 4's rejected DATE→DOUBLE cast
  private def pruneCond(bounds: Seq[Bound],
                        typeOf: String => DataType): Column =
    bounds.map {
      case NumBound(d, lo, hi) =>
        ZOrder.numView(col(s"max_$d"), typeOf(d)) >= lo &&
          ZOrder.numView(col(s"min_$d"), typeOf(d)) <= hi
      case StrBound(d, lo, hi) =>
        col(s"max_$d") >= lit(lo) && col(s"min_$d") <= lit(hi)
    }.reduce(_ && _)

  private def exactCond(bounds: Seq[Bound],
                        typeOf: String => DataType): Column =
    bounds.map {
      case NumBound(d, lo, hi) =>
        ZOrder.numView(col(d), typeOf(d)).between(lo, hi)
      case StrBound(d, lo, hi) => col(d).between(lit(lo), lit(hi))
    }.reduce(_ && _)

  private def prunedRead(spark: SparkSession, dataPath: String,
                         idx: DataFrame, bounds: Seq[Bound]): DataFrame = {
    val typeOf = (d: String) => idx.schema(s"min_$d").dataType
    val keep = idx.filter(pruneCond(bounds, typeOf)).select("file")
      .collect().map(r => new java.net.URI(r.getString(0)).getPath)
    if (keep.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(keep.toSeq: _*).filter(exactCond(bounds, typeOf))
  }

  // ----------------- per-file Bloom (equality) index -----------------

  /** Build (overwrite) a per-file BLOOM index over `cols` — the
    * equality-probe complement of the min/max envelopes: on a
    * high-cardinality key with no clustered layout, every file's
    * [min,max] spans the whole key space and envelope pruning reads
    * everything, but each file still holds only its own keys, and a
    * per-file membership sketch prunes an `id = X` probe to the one
    * (± fpp) file that can hold it. This is the Delta/Iceberg
    * bloom-filter-index read path.
    *
    * One distributed pass (groupBy input file, [[graft.plans.Bloom]]
    * aggregate per column); the index is rows=files, ~1.2 bytes per
    * distinct value per column at fpp=1% — model-sized.
    *
    * @param expectedItemsPerFile sizes each file's filter; overshoot
    *        costs bytes, undershoot costs false-positive scans (never
    *        wrong results — the exact predicate is always reapplied)
    */
  def buildBloom(spark: SparkSession, dataPath: String, bloomPath: String,
                 cols: Seq[String], expectedItemsPerFile: Long,
                 fpp: Double = graft.plans.Bloom.DefaultFpp): Unit = {
    requireDisjoint(dataPath, bloomPath)
    require(cols.nonEmpty, "buildBloom needs at least one column")
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.map(c => graft.plans.Bloom
          .sketch(col(c), expectedItemsPerFile, fpp).as(s"bloom_$c")): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(bloomPath)
  }

  /** Read `dataPath` filtered to the conjunctive equality `probes`,
    * scanning only files whose Bloom filters might contain EVERY
    * probed value (false positives re-filtered by the exact predicate;
    * false negatives impossible). Stale indexes are refused, exactly
    * like the envelope index.
    */
  def readEquals(spark: SparkSession, dataPath: String, bloomPath: String,
                 probes: Seq[(String, Any)]): DataFrame = {
    require(probes.nonEmpty, "readEquals needs at least one (column, value)")
    val idx = spark.read.parquet(bloomPath)
    val missing = probes.map(_._1).filterNot(c =>
      idx.columns.contains(s"bloom_$c"))
    require(missing.isEmpty,
      s"SkippingIndex: column(s) ${missing.mkString(", ")} not in the " +
        s"bloom index at $bloomPath (indexed: ${idx.columns
          .filter(_.startsWith("bloom_")).map(_.stripPrefix("bloom_"))
          .mkString(", ")})")
    val rows = idx.select(col("file") +:
      probes.map { case (c, _) => col(s"bloom_$c") }: _*).collect()
    val indexed = rows.map(r =>
      new java.net.URI(r.getString(0)).getPath).toSet
    requireFresh(spark, dataPath, indexed,
      "rebuild with buildBloom() after any write or compaction")
    val keep = rows.filter { r =>
      probes.indices.forall(i => graft.plans.Bloom.mightContain(
        r.getAs[Array[Byte]](i + 1), probes(i)._2))
    }.map(r => new java.net.URI(r.getString(0)).getPath)
    val exact = probes.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
    if (keep.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(keep.toSeq: _*).filter(exact)
  }

  /** How many files an equality probe must scan under the bloom
    * index (diagnostics / spec hook — the analog of
    * [[ZOrder.filesTouched]] for equality predicates).
    */
  def bloomFilesTouched(spark: SparkSession, bloomPath: String,
                        probes: Seq[(String, Any)]): Long = {
    val idx = spark.read.parquet(bloomPath)
    idx.select(col("file") +:
        probes.map { case (c, _) => col(s"bloom_$c") }: _*)
      .collect()
      .count { r =>
        probes.indices.forall(i => graft.plans.Bloom.mightContain(
          r.getAs[Array[Byte]](i + 1), probes(i)._2))
      }.toLong
  }

  // ----------------- TableVersions-keyed indexes -----------------

  private def indexDir(indexRoot: String, version: Long): String =
    new org.apache.hadoop.fs.Path(indexRoot, s"v$version").toString

  /** Build the index for the CURRENT committed version of a
    * [[graft.sinks.Compaction.writeVersioned]] root, keyed under
    * `indexRoot/v<version>`. Returns the version indexed. Indexes of
    * earlier versions are left in place — their data dirs are
    * immutable, so they remain exactly as valid as the snapshots
    * themselves.
    */
  def buildVersioned(spark: SparkSession, root: String, indexRoot: String,
                     cols: Seq[String]): Long = {
    val (v, _) = graft.sinks.Compaction.currentData(spark, root)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no committed version under $root"))
    buildVersionedFor(spark, root, indexRoot, cols, v)
    v
  }

  /** [[buildVersioned]] pinned to an EXPLICIT committed version — the
    * race-free form [[compactVersioned]] uses: between a commit and
    * "index the current version", a concurrent writer may advance the
    * chain, and indexing whatever is current then would leave the
    * just-committed version unindexed.
    */
  def buildVersionedFor(spark: SparkSession, root: String, indexRoot: String,
                        cols: Seq[String], version: Long): Unit = {
    requireDisjoint(root, indexRoot)
    val dataPath = graft.sinks.Compaction
      .dataPathFor(new org.apache.hadoop.fs.Path(root), version).toString
    ZOrder.fileStats(spark, dataPath, cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(indexDir(indexRoot, version))
  }

  /** Compact the current snapshot of a versioned root AND index the
    * new version in one step — the normal-operation lifecycle:
    * `compactVersioned(root, indexRoot, cols, ...)` leaves
    * [[readVersioned]] of the new current version pruning immediately,
    * so the manual-rebuild refusal is only ever hit by out-of-band
    * writes. Earlier versions keep their own indexes (time travel
    * unaffected). Returns the compaction stats; `stats.version` is the
    * newly committed (and indexed) version.
    */
  def compactVersioned(spark: SparkSession, root: String, indexRoot: String,
                       cols: Seq[String], maxRecordsPerFile: Long,
                       partitionCols: Seq[String] = Nil,
                       codec: String = "snappy",
                       keepHistory: Int = 2): graft.sinks.Compaction.Stats = {
    requireDisjoint(root, indexRoot)
    val stats = graft.sinks.Compaction.compactVersioned(spark, root,
      maxRecordsPerFile, partitionCols, codec, keepHistory)
    buildVersionedFor(spark, root, indexRoot, cols, stats.version)
    stats
  }

  /** [[graft.sinks.Compaction.writeVersioned]] AND index the committed
    * version in one step — the ingest-side twin of
    * [[compactVersioned]]. Returns the committed version.
    */
  def writeVersioned(df: DataFrame, root: String, indexRoot: String,
                     cols: Seq[String],
                     maxRecordsPerFile: Long = Long.MaxValue,
                     partitionCols: Seq[String] = Nil,
                     codec: String = "snappy"): Long = {
    requireDisjoint(root, indexRoot)
    val v = graft.sinks.Compaction.writeVersioned(df, root,
      maxRecordsPerFile, partitionCols, codec)
    buildVersionedFor(df.sparkSession, root, indexRoot, cols, v)
    v
  }

  /** Pruned read of a versioned root: the current committed version by
    * default, or `VERSION AS OF` via `version`. Because each index is
    * keyed to the immutable file set of one commit, appends and
    * compactions never invalidate it — build the new version's index
    * and current reads re-point, while pinned old-version reads keep
    * their own index.
    */
  def readVersioned(spark: SparkSession, root: String, indexRoot: String,
                    bounds: Seq[Bound],
                    version: Option[Long] = None): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = graft.sinks.TableVersions.committedVersions(fs, rootPath)
    require(committed.nonEmpty, s"no committed version under $root")
    val v = version.getOrElse(committed.max)
    require(committed.contains(v),
      s"v$v is not a committed version of $root " +
        s"(available: ${committed.map("v" + _).mkString(", ")})")
    val dataPath = graft.sinks.Compaction.dataPathFor(rootPath, v).toString
    val idxPath = indexDir(indexRoot, v)
    require(fs.exists(new org.apache.hadoop.fs.Path(idxPath)),
      s"SkippingIndex: no index for v$v of $root under $indexRoot — run " +
        "buildVersioned after each commit, or commit+index in one step " +
        "via SkippingIndex.compactVersioned/writeVersioned (earlier " +
        "versions keep their own indexes for time travel)")
    val idx = loadIndex(spark, idxPath, bounds)
    // a committed version's file set is immutable; mismatch (beyond
    // zero-row part files, which have no stats row) = out-of-band edit
    val indexed = idx.select("file")
      .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
    requireFresh(spark, dataPath, indexed,
      s"the v$v snapshot or its index was modified out-of-band")
    prunedRead(spark, dataPath, idx, bounds)
  }
}
