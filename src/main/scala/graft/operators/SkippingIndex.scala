package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Safety: [[read]] refuses a stale index. The data directory's
  * current parquet file set must equal the indexed set — an appended
  * or compacted file the index has never seen would otherwise be
  * silently skipped (wrong results, not just slow ones).
  */
object SkippingIndex {

  /** Build (overwrite) the index for `cols` over `dataPath`. */
  def build(spark: SparkSession, dataPath: String, indexPath: String,
            cols: Seq[String]): Unit =
    ZOrder.fileStats(spark, dataPath, cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath)

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

  /** Read `dataPath` filtered to the conjunctive `box`, scanning only
    * files whose indexed envelope intersects it. The exact predicate
    * is still applied — pruning is transparent.
    */
  def read(spark: SparkSession, dataPath: String, indexPath: String,
           box: Seq[(String, Double, Double)]): DataFrame = {
    require(box.nonEmpty, "SkippingIndex.read needs at least one bound")
    val idx = spark.read.parquet(indexPath)
    val unindexed = box.map(_._1).filterNot(d =>
      idx.columns.contains(s"min_$d") && idx.columns.contains(s"max_$d"))
    require(unindexed.isEmpty,
      s"SkippingIndex: dimension(s) ${unindexed.mkString(", ")} not in " +
        s"the index at $indexPath (indexed: ${idx.columns.filter(_
          .startsWith("min_")).map(_.stripPrefix("min_")).mkString(", ")})")
    val stringDims = box.map(_._1).filter(d =>
      idx.schema(s"min_$d").dataType ==
        org.apache.spark.sql.types.StringType)
    require(stringDims.isEmpty,
      s"SkippingIndex: dimension(s) ${stringDims.mkString(", ")} are " +
        "strings — numeric boxes cannot prune them; encode or cast the " +
        "column before indexing")
    val indexed = idx.select("file")
      .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
    val current = dataFiles(spark, dataPath)
    require(indexed == current,
      s"SkippingIndex: stale index for $dataPath — indexed ${indexed.size} " +
        s"files, directory holds ${current.size}; rebuild with build() " +
        "after any write or compaction")
    val cond = box.map { case (d, lo, hi) =>
      col(s"max_$d").cast("double") >= lo && col(s"min_$d").cast("double") <= hi
    }.reduce(_ && _)
    val keep = idx.filter(cond).select("file")
      .collect().map(r => new java.net.URI(r.getString(0)).getPath)
    val exact = box.map { case (d, lo, hi) =>
      col(d).cast("double").between(lo, hi)
    }.reduce(_ && _)
    if (keep.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(keep.toSeq: _*).filter(exact)
  }
}
