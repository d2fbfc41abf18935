package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcColumns, CdcMerge}
import graft.sinks.TableVersions
import graft.streaming.BucketedCdcState

/** TableVersions snapshot-chain commits and the incremental bucketed
  * CDC state built on them.
  */
class VersionedStateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def hadoopFs(root: String) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // ---------------- TableVersions ----------------

  test("versions commit atomically; uncommitted dirs are invisible and reclaimed") {
    val root = Files.createTempDirectory("tv").toString + "/t"
    val (fs, rootPath) = hadoopFs(root)
    assert(TableVersions.current(fs, rootPath).isEmpty)

    val p0 = TableVersions.begin(fs, rootPath)
    assert(p0.version == 0L)
    // data written but not committed: invisible
    fs.create(new Path(p0.dir, "data.bin"), true).close()
    assert(TableVersions.current(fs, rootPath).isEmpty)
    TableVersions.commit(fs, rootPath, p0)
    assert(TableVersions.current(fs, rootPath).contains(0L))
    assert(TableVersions.hint(fs, rootPath).contains(0L))

    // crash before commit: leftover v1 is reclaimed by the next begin
    val p1 = TableVersions.begin(fs, rootPath)
    fs.create(new Path(p1.dir, "halfwritten"), true).close()
    // (no commit — simulate crash)
    val p1b = TableVersions.begin(fs, rootPath)
    assert(p1b.version == 1L)
    assert(!fs.exists(new Path(p1b.dir, "halfwritten")), "reclaim clears leftovers")
    TableVersions.commit(fs, rootPath, p1b)
    assert(TableVersions.committedVersions(fs, rootPath) == Seq(0L, 1L))

    TableVersions.prune(fs, rootPath, keep = 1)
    assert(TableVersions.committedVersions(fs, rootPath) == Seq(1L))
    assert(!fs.exists(TableVersions.dataDir(rootPath, 0L)))
  }

  test("writer-token fencing: a zombie writer cannot publish a successor's directory") {
    val root = Files.createTempDirectory("tv_fence").toString + "/t"
    val (fs, rootPath) = hadoopFs(root)
    val zombie = TableVersions.begin(fs, rootPath) // writer A reserves v0
    // failover: writer B takes over the same version number
    val successor = TableVersions.begin(fs, rootPath)
    assert(successor.version == zombie.version)
    // A wakes up and tries to commit — must NOT publish B's half-written data
    val e = intercept[IllegalArgumentException](TableVersions.commit(fs, rootPath, zombie))
    assert(e.getMessage.contains("token mismatch"))
    assert(TableVersions.current(fs, rootPath).isEmpty, "nothing published by the zombie")
    // B's own commit is unaffected
    TableVersions.commit(fs, rootPath, successor)
    assert(TableVersions.current(fs, rootPath).contains(0L))
  }

  test("commit guards: missing dir rejected; corrupt hint degrades to None") {
    val root = Files.createTempDirectory("tv_guard").toString + "/t"
    val (fs, rootPath) = hadoopFs(root)
    val p = TableVersions.begin(fs, rootPath)
    fs.delete(p.dir, true)
    intercept[IllegalArgumentException](TableVersions.commit(fs, rootPath, p))
    assert(TableVersions.current(fs, rootPath).isEmpty)

    val good = TableVersions.begin(fs, rootPath)
    TableVersions.commit(fs, rootPath, good)
    intercept[IllegalArgumentException](TableVersions.commit(fs, rootPath, good)) // double commit

    val out = fs.create(new Path(rootPath, "VERSION"), true)
    out.write("not-a-number".getBytes("UTF-8")); out.close()
    assert(TableVersions.hint(fs, rootPath).isEmpty, "corrupt hint is advisory → None")
    assert(TableVersions.current(fs, rootPath).contains(0L), "markers stay authoritative")
  }

  // ---------------- versioned compaction ----------------

  test("versioned compaction: racing readers never see a missing or partial snapshot") {
    import graft.sinks.Compaction
    val root = Files.createTempDirectory("tv_compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Compaction.writeVersioned(df.repartition(20), root)
    assert(Compaction.readCurrent(spark, root).count() == 5000)

    @volatile var failure: Option[Throwable] = None
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          // resolve + read exactly like a consumer: must always be a
          // complete committed snapshot, mid-compaction or not
          val n = Compaction.readCurrent(spark, root).count()
          assert(n == 5000, s"reader saw partial snapshot: $n rows")
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    val stats = try {
      (1 to 3).map(_ =>
        Compaction.compactVersioned(spark, root, maxRecordsPerFile = 10000,
          keepHistory = 3)).last
    } finally { stop.set(true); reader.join() }
    assert(failure.isEmpty, s"racing reader failed: ${failure.map(_.getMessage)}")
    assert(reads.get() > 0, "reader never completed a read")
    assert(stats.rowsAfter == 5000 && stats.filesAfter == 1)
    assert(Compaction.readCurrent(spark, root)
      .as[(Long, String)].collect().toSet == (1 to 5000).map(i => (i.toLong, s"v$i")).toSet)
    // history retained for in-flight readers, bounded by keepHistory
    val (fs, rootPath) = hadoopFs(root)
    assert(TableVersions.committedVersions(fs, rootPath).size <= 3)
  }

  // ---------------- BucketedCdcState ----------------

  private val B = 8

  private def mkLog(rows: Seq[(Long, Long, Int, String)]) =
    rows.toDF("id", "seq", CdcColumns.OperationCol, "v")

  private def fullLogState(rows: Seq[(Long, Long, Int, String)]): Map[Long, (Long, Int, String)] =
    CdcMerge.latestByKey(mkLog(rows), Seq("id"), Seq("seq"))
      .as[(Long, Long, Int, String)].collect()
      .map { case (id, seq, op, v) => id -> (seq, op, v) }.toMap

  private def bucketedState(root: String): Map[Long, (Long, Int, String)] =
    BucketedCdcState.state(spark, root).get
      .select("id", "seq", CdcColumns.OperationCol, "v")
      .as[(Long, Long, Int, String)].collect()
      .map { case (id, seq, op, v) => id -> (seq, op, v) }.toMap

  /** All data file (path, mtime) pairs under the state root. */
  private def dataFileStamps(root: String): Map[String, Long] = {
    val (fs, rootPath) = hadoopFs(root)
    val it = fs.listFiles(rootPath, true)
    val buf = scala.collection.mutable.Map.empty[String, Long]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString -> f.getModificationTime
    }
    buf.toMap
  }

  test("bucketed state over 3 micro-batches equals the full-log latest-wins merge") {
    val root = Files.createTempDirectory("bstate").toString + "/t"
    val b1 = Seq((1L, 1L, 2, "a1"), (2L, 2L, 2, "b1"), (3L, 3L, 2, "c1"),
                 (10L, 1L, 2, "j1"), (11L, 1L, 2, "k1"))
    val b2 = Seq((1L, 4L, 4, "a2"), (2L, 5L, 1, null), (4L, 4L, 2, "d1"))
    val b3 = Seq((3L, 6L, 4, "c2"), (4L, 2L, 4, "dSTALE"), (5L, 7L, 2, "e1"))
    Seq(b1, b2, b3).foreach(b =>
      BucketedCdcState.applyBatch(mkLog(b), root, Seq("id"), Seq("seq"), B))

    assert(bucketedState(root) == fullLogState(b1 ++ b2 ++ b3))
    // tombstone for id=2 retained in state, hidden from the live view
    assert(bucketedState(root)(2L)._2 == CdcMerge.DeleteOp)

    // prune keeps every version the bucket map references: state still whole
    BucketedCdcState.prune(spark, root, keepHistory = 1)
    assert(bucketedState(root) == fullLogState(b1 ++ b2 ++ b3))
  }

  test("a micro-batch rewrites ONLY the buckets its keys hash into") {
    val root = Files.createTempDirectory("bstate_inc").toString + "/t"
    // seed state across many buckets
    val seed = (1L to 40L).map(i => (i, 1L, 2, s"v$i"))
    BucketedCdcState.applyBatch(mkLog(seed), root, Seq("id"), Seq("seq"), B)

    // pick keys all hashing into ONE bucket
    val byBucket = spark.range(1, 41)
      .withColumn("b", BucketedCdcState.bucketOf(Seq("id"), B))
      .as[(Long, Int)].collect().groupBy(_._2)
    val (bucket, members) = byBucket.maxBy(_._2.length)
    val keys = members.map(_._1).take(2)
    assert(keys.nonEmpty)

    val before = dataFileStamps(root)
    val delta = keys.map(k => (k, 9L, 4, s"upd$k")).toSeq
    BucketedCdcState.applyBatch(mkLog(delta), root, Seq("id"), Seq("seq"), B)
    val after = dataFileStamps(root)

    // every v0 file survives bit-identical in place (same path, same mtime)
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"pre-existing state file deleted: $path")
      assert(after(path) == mtime, s"pre-existing state file rewritten: $path")
    }
    // new files landed only under v1's directory for the touched bucket
    val newFiles = (after.keySet -- before.keySet).toSeq
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(_.contains(s"/v1/buckets/__bucket=$bucket/")),
      s"unexpected rewrite outside bucket $bucket: $newFiles")
    // and the merge is still correct
    assert(bucketedState(root) == fullLogState(seed ++ delta))
  }

  test("replay from a stale VERSION converges to the identical state") {
    val root = Files.createTempDirectory("bstate_replay").toString + "/t"
    val (fs, rootPath) = hadoopFs(root)
    val b1 = (1L to 20L).map(i => (i, 1L, 2, s"v$i"))
    val b2 = Seq((3L, 5L, 4, "x3"), (7L, 5L, 1, null), (21L, 5L, 2, "n21"))
    BucketedCdcState.applyBatch(mkLog(b1), root, Seq("id"), Seq("seq"), B)
    BucketedCdcState.applyBatch(mkLog(b2), root, Seq("id"), Seq("seq"), B)
    val expected = bucketedState(root)

    // crash before commit: wipe v1's marker so the chain points at v0 again
    fs.delete(new Path(TableVersions.dataDir(rootPath, 1L), "_GRAFT_COMMITTED"), false)
    assert(TableVersions.current(fs, rootPath).contains(0L))
    assert(bucketedState(root) == fullLogState(b1), "stale read sees only batch 1")

    // at-least-once redelivery of batch 2 — latest-wins merge is idempotent
    BucketedCdcState.applyBatch(mkLog(b2), root, Seq("id"), Seq("seq"), B)
    assert(bucketedState(root) == expected)
  }

  test("schema evolution across commits: later batches may add columns") {
    val root = Files.createTempDirectory("bstate_evo").toString + "/t"
    val b1 = Seq((1L, 1L, 2, "a1"), (2L, 1L, 2, "b1"))
    BucketedCdcState.applyBatch(mkLog(b1), root, Seq("id"), Seq("seq"), B)
    val b2 = Seq((1L, 2L, 4, "a2", "extra"))
      .toDF("id", "seq", CdcColumns.OperationCol, "v", "w")
    BucketedCdcState.applyBatch(b2, root, Seq("id"), Seq("seq"), B)
    val st = BucketedCdcState.state(spark, root).get
      .select("id", "v", "w").as[(Long, String, Option[String])]
      .collect().map { case (id, v, w) => id -> (v, w) }.toMap
    assert(st(1L) == ("a2", Some("extra")))
    assert(st(2L) == ("b1", None), "old-schema bucket reads with null for the added column")
  }
}
