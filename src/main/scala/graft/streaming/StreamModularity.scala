package graft.streaming

import org.apache.hadoop.fs.Path
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
  * batch's new edges; cost is O(|batch|), never O(|graph|), and the
  * per-community state table is community-sized.
  *
  * The new-edge anti-join against the state edge list makes the fold
  * idempotent under replay (a redelivered batch finds zero new
  * edges) — the [[StreamTriangles]] convention, no batchId
  * bookkeeping. Edges whose endpoints the assignment misses REFUSE,
  * exactly like the batch operator. State (edges + stats) publishes
  * through [[TableVersions]].
  */
object StreamModularity {

  def start(stream: DataFrame, aCol: String, bCol: String,
            assignment: DataFrame, nodeCol: String, communityCol: String,
            dir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, aCol, bCol, assignment, nodeCol, communityCol, dir)
        ()
      }
      .start()

  /** One microbatch of edges; factored out for direct use. */
  def applyBatch(batch: DataFrame, aCol: String, bCol: String,
                 assignment: DataFrame, nodeCol: String,
                 communityCol: String, dir: String): Unit = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val assign = assignment.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).as("community"))
    val canon = batch
      .select(least(col(aCol), col(bCol)).cast("long").as("x"),
        greatest(col(aCol), col(bCol)).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
    val cur = TableVersions.current(fs, root)
    val (old, oldStats, oldM) = cur match {
      case Some(v) =>
        val vdir = TableVersions.dataDir(root, v)
        (spark.read.parquet(new Path(vdir, "edges").toString),
          spark.read.parquet(new Path(vdir, "stats").toString),
          TableVersions.readSmall(fs, new Path(vdir, "m"))
            .map(_.toLong).getOrElse(0L))
      case None =>
        (canon.limit(0),
          assign.limit(0).select(col("community"),
            lit(0L).as("e_in"), lit(0L).as("d_c")),
          0L)
    }
    // truly-new edges only: replayed/duplicate edges are no-ops
    val newE = canon.join(old, Seq("x", "y"), "left_anti")
      .localCheckpoint(true)
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
    val pending = TableVersions.begin(fs, root)
    old.unionByName(newE).write
      .parquet(new Path(pending.dir, "edges").toString)
    merged.write.parquet(new Path(pending.dir, "stats").toString)
    TableVersions.writeSmall(fs, new Path(pending.dir, "m"),
      (oldM + dm).toString)
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** The current committed per-community modularity table — same
    * schema and algebra as the batch operator (n_nodes from the
    * assignment, so zero-edge communities stay visible with
    * contribution 0). Σ q_contrib = Q of the streamed graph.
    */
  def report(spark: SparkSession, dir: String, assignment: DataFrame,
             nodeCol: String, communityCol: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(
        s"StreamModularity($dir): no committed state yet"))
    val vdir = TableVersions.dataDir(root, v)
    val stats = spark.read.parquet(new Path(vdir, "stats").toString)
    val m = TableVersions.readSmall(fs, new Path(vdir, "m"))
      .map(_.toLong).getOrElse(0L)
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
