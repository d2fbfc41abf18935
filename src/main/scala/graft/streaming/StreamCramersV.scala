package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.GroupTests
import graft.sinks.TableVersions

/** STREAMING Cramér's V — a live categorical-association readout
  * over an append stream: the per-(family, row, column) contingency
  * CELL counts are the ADDITIVE sufficient statistic
  * ([[GroupTests.cramersVFromCells]] computes entirely from them,
  * structural zeros included by its dense-grid expansion), so a
  * microbatch folds in as one count aggregate + one merge at
  * cell-cardinality.
  *
  * Counts are additive, not idempotent — the fold carries the
  * committed-batchId replay guard (the [[StreamGroupTests]]
  * convention). State publishes through [[TableVersions]]; the
  * readout selects the current version and runs the shared batch
  * machinery, so stream == batch by construction.
  */
object StreamCramersV {

  def start(stream: DataFrame, famCol: String, rowCol: String,
            colCol: String, dir: String,
            checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, famCol, rowCol, colCol, dir, batchId)
        ()
      }
      .start()

  /** One microbatch; factored out for replay and direct use. */
  def applyBatch(batch: DataFrame, famCol: String, rowCol: String,
                 colCol: String, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = TableVersions.current(fs, root)
    val committed = cur.flatMap(v => TableVersions.readSmall(fs,
      new Path(TableVersions.dataDir(root, v), "batch"))).map(_.toLong)
    if (committed.exists(batchId <= _)) return // replayed batch: no-op
    val delta = batch.select(col(famCol).as("g"), col(rowCol).as("r"),
        col(colCol).as("c"))
      .groupBy(col("g"), col("r"), col("c"))
      .agg(count(lit(1)).cast("bigint").as("o"))
    val merged = cur match {
      case Some(v) =>
        spark.read.parquet(
            new Path(TableVersions.dataDir(root, v), "cells").toString)
          .unionByName(delta)
          .groupBy(col("g"), col("r"), col("c"))
          .agg(sum(col("o")).cast("bigint").as("o"))
      case None => delta
    }
    val pending = TableVersions.begin(fs, root)
    merged.write.parquet(new Path(pending.dir, "cells").toString)
    TableVersions.writeSmall(fs, new Path(pending.dir, "batch"),
      batchId.toString)
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** Current chi-square + Cramér's V per family — == the batch
    * [[GroupTests.cramersV]] over everything streamed so far.
    */
  def current(spark: SparkSession, dir: String,
              famCol: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(
        s"StreamCramersV($dir): no committed state yet"))
    GroupTests.cramersVFromCells(spark.read.parquet(
      new Path(TableVersions.dataDir(root, v), "cells").toString), famCol)
  }
}
