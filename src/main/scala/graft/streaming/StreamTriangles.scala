package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.GraphOps
import graft.sinks.TableVersions

/** STREAMING triangle-count maintenance — the incremental form of
  * [[GraphOps.triangleCount]] under an edge-insert stream: the count
  * stays current without ever recounting the whole graph.
  *
  * Per microbatch, the truly-new edges N (batch edges not already in
  * state — so duplicate and REPLAYED edges are no-ops by
  * construction) add exactly the triangles with ≥1 new edge,
  * partitioned by how many new edges they contain:
  *
  *  - T1 (one new edge): new (a,b) closing an OLD wedge — count the
  *    common old-neighbors of a and b (two equi-joins against the
  *    old symmetric edge list);
  *  - T2 (two new edges): new (a,b), new (a,c) meeting at apex a,
  *    closed by an OLD edge (b,c) — counted once via the b<c
  *    constraint at the unique apex;
  *  - T3 (three new edges): [[GraphOps.triangleCount]] of N alone.
  *
  * Each class is a handful of equi-joins whose cost is |batch|·deg,
  * never |graph|². State = the canonical edge list + the running
  * count, published through [[TableVersions]]; the new-edge anti-join
  * makes the fold idempotent under replay (a redelivered batch finds
  * zero new edges), so no batchId bookkeeping is needed.
  */
object StreamTriangles {

  def start(stream: DataFrame, aCol: String, bCol: String,
            dir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, aCol, bCol, dir)
        ()
      }
      .start()

  /** One microbatch of edges; factored out for direct use. */
  def applyBatch(batch: DataFrame, aCol: String, bCol: String,
                 dir: String): Unit = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val canon = batch
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
    val cur = TableVersions.current(fs, root)
    val (old, prevCount) = cur match {
      case Some(v) =>
        val vdir = TableVersions.dataDir(root, v)
        val st = spark.read.parquet(new Path(vdir, "edges").toString)
        val c = TableVersions.readSmall(fs, new Path(vdir, "count"))
          .map(_.toLong).getOrElse(0L)
        (st, c)
      case None => (canon.limit(0), 0L)
    }
    // truly-new edges only: replayed/duplicate edges are no-ops
    val newE = canon.join(old, Seq("x", "y"), "left_anti")
      .localCheckpoint(true)
    val oldSym = old.select(col("x").as("a"), col("y").as("b"))
      .unionByName(old.select(col("y").as("a"), col("x").as("b")))
      .localCheckpoint(true)
    // T1: new (a,b) + old (a,c) + old (b,c)
    val t1 = newE
      .join(oldSym.select(col("a").as("x"), col("b").as("c1")), "x")
      .join(oldSym.select(col("a").as("y"), col("b").as("c2")), "y")
      .filter(col("c1") === col("c2"))
      .count()
    // T2: apex a with two new edges (a,b), (a,c), b<c, closed by OLD (b,c)
    val newSym = newE.select(col("x").as("a"), col("y").as("b"))
      .unionByName(newE.select(col("y").as("a"), col("x").as("b")))
    val t2 = newSym.select(col("a"), col("b").as("w1"))
      .join(newSym.select(col("a"), col("b").as("w2")), "a")
      .filter(col("w1") < col("w2"))
      .join(old.select(col("x").as("w1"), col("y").as("w2")),
        Seq("w1", "w2"), "left_semi")
      .count()
    // T3: triangles entirely inside the new edges
    val t3 = GraphOps.triangleCount(newE, "x", "y")
      .select(col("n_triangles")).collect()(0).getLong(0)
    val total = prevCount + t1 + t2 + t3
    val pending = TableVersions.begin(fs, root)
    old.unionByName(newE).write
      .parquet(new Path(pending.dir, "edges").toString)
    TableVersions.writeSmall(fs, new Path(pending.dir, "count"),
      total.toString)
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** The current committed (n_edges, n_triangles). */
  def counts(spark: SparkSession, dir: String): (Long, Long) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(
        s"StreamTriangles($dir): no committed state yet"))
    val vdir = TableVersions.dataDir(root, v)
    val nE = spark.read.parquet(new Path(vdir, "edges").toString).count()
    val nT = TableVersions.readSmall(fs, new Path(vdir, "count"))
      .map(_.toLong).getOrElse(0L)
    (nE, nT)
  }
}
