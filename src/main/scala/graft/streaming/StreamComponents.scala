package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Components
import graft.sinks.TableVersions

/** STREAMING connected-components maintenance — the incremental form
  * of [[Components.connectedComponents]] under an edge-insert stream
  * (the live view behind transitive near-dup clustering: "which
  * cluster is this document in, right now").
  *
  * The fold identity: treating a labelling as the star edge set
  * {(node, component)}, comps(S ∪ T) = comps(stars(comps(S)) ∪ T) —
  * new edges can only MERGE existing components, and a merge is
  * exactly what min-label propagation over the star graph plus the
  * batch edges computes. So state is the (id, component) table —
  * nodes-sized, never the edge history — and each microbatch runs
  * components over |state| + |batch| star/batch edges, with the star
  * side converging in O(1) hops because every state component is
  * depth-1 by construction.
  *
  * Replay-idempotent BY ALGEBRA (no batchId bookkeeping): a
  * redelivered batch contributes edges whose endpoints already share
  * a component — min-label propagation is idempotent over them, and
  * the unchanged fixpoint commits byte-identically.
  */
object StreamComponents {

  def start(stream: DataFrame, aCol: String, bCol: String,
            dir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, aCol, bCol, dir)
        ()
      }
      .start()

  /** One microbatch of undirected edges; factored out for direct use. */
  def applyBatch(batch: DataFrame, aCol: String, bCol: String,
                 dir: String): Unit = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val edges = batch.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    val all = TableVersions.current(fs, root) match {
      case Some(v) =>
        val stars = spark.read.parquet(
            new Path(TableVersions.dataDir(root, v), "labels").toString)
          .select(col("id").as("src"), col("component").as("dst"))
        stars.unionByName(edges)
      case None => edges
    }
    val labels = Components.connectedComponents(all, "src", "dst")
    val pending = TableVersions.begin(fs, root)
    labels.write.parquet(new Path(pending.dir, "labels").toString)
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** The current committed (id, component) labelling. */
  def labels(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(
        s"StreamComponents($dir): no committed labelling yet"))
    spark.read.parquet(new Path(TableVersions.dataDir(root, v), "labels").toString)
  }
}
