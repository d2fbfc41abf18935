package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.TableVersions

/** STREAMING modularity maintenance — the incremental form of
  * [[graft.operators.GraphOps.modularity]] under an edge-insert
  * stream and a FIXED community assignment: the quality score stays
  * current without re-scanning the graph.
  *
  * Modularity is pure sufficient-statistics algebra — Q depends only
  * on (m, e_c, d_c) — and every statistic is ADDITIVE in edges: a
  * truly-new edge adds 1 to m, 1 degree to each endpoint's community
  * mass, and 1 to e_c iff both endpoints share c. So a microbatch
  * folds in as three community-cardinality aggregates over the
  * batch's new edges; fold COMPUTE is O(|batch|), never O(|graph|).
  *
  * STATE is the canonical edge set in a [[VersionedDeltaState]]
  * snapshot chain of BUCKET-PARTITIONED append-only segments (the
  * [[StreamLineDedup]] convention): a batch COMMITS only its own new
  * edges — O(|batch|) write I/O too, untouched bucket files survive
  * byte-identical (spec-asserted) — and the newness anti-join reads
  * only the buckets the batch's edges hash into (hive partition
  * pruning over every segment). The (per-community stats, m) tables
  * ride each commit as aside payloads — community-cardinality, so
  * rewriting them per batch is model-sized — and replay-anchor with
  * the edge set: a redelivered batch re-derives the same delta and
  * stats from the pre-batch snapshot its first attempt saw,
  * superseding that attempt. Edges whose endpoints the assignment
  * misses REFUSE, exactly like the batch operator. Segments
  * consolidate every `compactEvery` batches.
  */
object StreamModularity {

  /** Hive-partition fan-out of the edge state. */
  val NBuckets = 64

  /** Default consolidation cadence. */
  val DefaultCompactEvery = 64

  private val MFile = "m"
  private val StatsDir = "stats"

  def start(stream: DataFrame, aCol: String, bCol: String,
            assignment: DataFrame, nodeCol: String, communityCol: String,
            dir: String, checkpointDir: String,
            compactEvery: Int = DefaultCompactEvery): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, aCol, bCol, assignment, nodeCol, communityCol,
          dir, batchId, compactEvery)
        ()
      }
      .start()

  /** One microbatch of edges; factored out for direct use. */
  def applyBatch(batch: DataFrame, aCol: String, bCol: String,
                 assignment: DataFrame, nodeCol: String,
                 communityCol: String, dir: String, batchId: Long,
                 compactEvery: Int = DefaultCompactEvery): Unit = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      consolidate(spark, dir, batchId)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val assign = assignment.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).as("community"))
    val canon = batch
      .select(least(col(aCol), col(bCol)).cast("long").as("x"),
        greatest(col(aCol), col(bCol)).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
      .withColumn("__bucket",
        pmod(xxhash64(col("x"), col("y")), lit(NBuckets)).cast("int"))
      .localCheckpoint(true)
    val anchorDir = VersionedDeltaState.versionDirBefore(spark, dir, batchId)
    val oldM = anchorDir
      .flatMap(d => TableVersions.readSmall(fs, new Path(d, MFile)))
      .map(_.trim.toLong).getOrElse(0L)
    val oldStats = anchorDir
      .filter(d => fs.exists(new Path(d, StatsDir)))
      .map(d => spark.read.parquet(new Path(d, StatsDir).toString))
      .getOrElse(assign.limit(0).select(col("community"),
        lit(0L).as("e_in"), lit(0L).as("d_c")))
    // newness check reads ONLY the buckets this batch hashes into
    val touched = canon.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val newE = (VersionedDeltaState.stateBefore(spark, dir, batchId) match {
      case Some(st) =>
        canon.join(st.filter(col("__bucket").isin(touched: _*)),
          Seq("x", "y"), "left_anti")
      case None => canon
    }).localCheckpoint(true)
    val withC = newE
      .join(assign.select(col("node").as("x"), col("community").as("cx")),
        Seq("x"), "left")
      .join(assign.select(col("node").as("y"), col("community").as("cy")),
        Seq("y"), "left")
      .localCheckpoint(true)
    val missing = withC.filter(col("cx").isNull || col("cy").isNull)
    require(missing.isEmpty,
      "StreamModularity: edge endpoints missing from the assignment — " +
        "a silent drop would misstate the community degree mass " +
        s"(first few: ${missing.limit(3).collect().mkString(", ")})")
    val dm = withC.count()
    // Δd_c: one degree per endpoint; Δe_c: both endpoints share c
    val dDeg = withC.select(col("cx").as("community"))
      .unionAll(withC.select(col("cy").as("community")))
      .groupBy(col("community")).agg(count(lit(1)).as("d_c"))
      .withColumn("e_in", lit(0L))
    val dIn = withC.filter(col("cx") === col("cy"))
      .groupBy(col("cx").as("community"))
      .agg(count(lit(1)).as("e_in"))
      .withColumn("d_c", lit(0L))
    val merged = oldStats.unionByName(dDeg.select("community", "e_in", "d_c"))
      .unionByName(dIn.select("community", "e_in", "d_c"))
      .groupBy(col("community"))
      .agg(sum(col("e_in")).cast("bigint").as("e_in"),
        sum(col("d_c")).cast("bigint").as("d_c"))
      .localCheckpoint(true) // pin: materialized before the commit window
    VersionedDeltaState.append(spark, dir,
      newE.select(col("x"), col("y"), col("__bucket")),
      tag = batchId, partitionCols = Seq("__bucket"),
      aside = d => {
        merged.write.parquet(new Path(d, StatsDir).toString)
        TableVersions.writeSmall(fs, new Path(d, MFile),
          (oldM + dm).toString)
      })
  }

  /** Merge the edge segments visible to batch `uptoExclusive` into one
    * (plain union — distinct by construction), carrying the (stats, m)
    * aside payloads into the merged commit, then reclaim superseded
    * versions.
    */
  private[streaming] def consolidate(spark: SparkSession, dir: String,
                                     uptoExclusive: Long): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    VersionedDeltaState.consolidate(spark, dir, uptoExclusive,
      partitionCols = Seq("__bucket"),
      carry = (anchorDir, pendingDir) => {
        TableVersions.readSmall(fs, new Path(anchorDir, MFile))
          .foreach(m => TableVersions.writeSmall(fs,
            new Path(pendingDir, MFile), m))
        val src = new Path(anchorDir, StatsDir)
        if (fs.exists(src))
          FileUtil.copy(fs, src, fs, new Path(pendingDir, StatsDir),
            false, conf)
      })
    VersionedDeltaState.prune(spark, dir)
  }

  /** The current committed per-community modularity table — same
    * schema and algebra as the batch operator (n_nodes from the
    * assignment, so zero-edge communities stay visible with
    * contribution 0). Σ q_contrib = Q of the streamed graph.
    */
  def report(spark: SparkSession, dir: String, assignment: DataFrame,
             nodeCol: String, communityCol: String): DataFrame = {
    val vdir = VersionedDeltaState.currentVersionDir(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"StreamModularity($dir): no committed state yet"))
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = spark.read.parquet(new Path(vdir, StatsDir).toString)
    val m = TableVersions.readSmall(fs, new Path(vdir, MFile))
      .map(_.trim.toLong).getOrElse(0L)
    val census = assignment
      .select(col(nodeCol).cast("long").as("node"),
        col(communityCol).as("community"))
      .groupBy(col("community"))
      .agg(count(lit(1)).cast("bigint").as("n_nodes"))
    val mC = lit(m).cast("decimal(20,0)")
    census.join(stats, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).cast("bigint").as("e_in"),
        coalesce(col("d_c"), lit(0L)).cast("bigint").as("deg_sum"),
        round((mC * coalesce(col("e_in"), lit(0L)).cast("decimal(20,0)") * 4
          - coalesce(col("d_c"), lit(0L)).cast("decimal(20,0)")
            * coalesce(col("d_c"), lit(0L)).cast("decimal(20,0)"))
          .cast("decimal(38,0)").cast("double") /
          (mC * mC * 4).cast("decimal(38,0)").cast("double"), 9)
          .as("q_contrib"))
  }
}
