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

    // crash before commit: the dead staging dir stays invisible and a
    // fresh begin stages the same version number in its own dir
    val p1 = TableVersions.begin(fs, rootPath)
    fs.create(new Path(p1.dir, "halfwritten"), true).close()
    // (no commit — simulate crash)
    val p1b = TableVersions.begin(fs, rootPath)
    assert(p1b.version == 1L)
    assert(p1b.dir != p1.dir)
    TableVersions.commit(fs, rootPath, p1b)
    assert(TableVersions.committedVersions(fs, rootPath) == Seq(0L, 1L))
    // once v1 is committed, the crashed writer's staging dir is
    // provably dead and the next begin reclaims it
    assert(fs.exists(p1.dir))
    val p2 = TableVersions.begin(fs, rootPath)
    assert(!fs.exists(p1.dir), "dead staging dir must be reclaimed")
    fs.delete(p2.dir, true)

    TableVersions.prune(fs, rootPath, keep = 1)
    assert(TableVersions.committedVersions(fs, rootPath) == Seq(1L))
    assert(!fs.exists(TableVersions.dataDir(rootPath, 0L)))
  }

  test("staging fence: concurrent writers never mix data; the loser gets version-taken") {
    val root = Files.createTempDirectory("tv_fence").toString + "/t"
    val (fs, rootPath) = hadoopFs(root)
    val zombie = TableVersions.begin(fs, rootPath) // writer A reserves v0
    // failover: writer B takes over the same version number; each
    // stages in its OWN token-named dir, so neither can scribble into
    // the other's files — the half-written-mix hazard is structural
    val successor = TableVersions.begin(fs, rootPath)
    assert(successor.version == zombie.version)
    assert(zombie.dir != successor.dir)
    fs.create(new Path(zombie.dir, "a-data"), true).close()
    fs.create(new Path(successor.dir, "b-data"), true).close()

    // B commits first: v0 is B's complete directory
    TableVersions.commit(fs, rootPath, successor)
    assert(TableVersions.current(fs, rootPath).contains(0L))
    assert(fs.exists(new Path(TableVersions.dataDir(rootPath, 0L), "b-data")))
    assert(!fs.exists(new Path(TableVersions.dataDir(rootPath, 0L), "a-data")),
      "zombie data must never appear in the successor's published version")

    // the zombie's late commit fails version-taken instead of clobbering
    val e = intercept[IllegalArgumentException](TableVersions.commit(fs, rootPath, zombie))
    assert(e.getMessage.contains("already committed"))
    assert(fs.exists(new Path(TableVersions.dataDir(rootPath, 0L), "b-data")))

    // first-commit-wins the other way round: on a fresh root the
    // zombie publishes its OWN complete dir and the successor aborts
    val root2 = Files.createTempDirectory("tv_fence2").toString + "/t"
    val (fs2, rootPath2) = hadoopFs(root2)
    val a2 = TableVersions.begin(fs2, rootPath2)
    val b2 = TableVersions.begin(fs2, rootPath2)
    fs2.create(new Path(a2.dir, "a-data"), true).close()
    TableVersions.commit(fs2, rootPath2, a2)
    intercept[IllegalArgumentException](TableVersions.commit(fs2, rootPath2, b2))
    assert(fs2.exists(new Path(TableVersions.dataDir(rootPath2, 0L), "a-data")))
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

  test("time travel: every unpruned version reads back as its own committed snapshot") {
    import graft.sinks.Compaction
    val root = Files.createTempDirectory("tv_travel").toString + "/t"
    val v0 = Compaction.writeVersioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val v1 = Compaction.writeVersioned(
      Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "v"), root)
    assert(Compaction.readVersion(spark, root, v0)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(Compaction.readVersion(spark, root, v1)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (2L, "b"), (3L, "c")))
    // current == newest; a missing version fails with the available list
    assert(Compaction.readCurrent(spark, root)
      .as[(Long, String)].collect().toSet ==
      Compaction.readVersion(spark, root, v1).as[(Long, String)].collect().toSet)
    val e = intercept[IllegalArgumentException](
      Compaction.readVersion(spark, root, 99L))
    assert(e.getMessage.contains("v99") && e.getMessage.contains("v0"))
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

  test("prune keeps data referenced by EVERY map in the reader window, not just the newest") {
    val root = Files.createTempDirectory("bstate_prune").toString + "/t"
    val (fs, rootPath) = hadoopFs(root)
    // v0: all buckets; v1: one key's bucket; v2: all buckets again
    val seed = (1L to 40L).map(i => (i, 1L, 2, s"v$i"))
    BucketedCdcState.applyBatch(mkLog(seed), root, Seq("id"), Seq("seq"), B)
    BucketedCdcState.applyBatch(mkLog(Seq((1L, 5L, 4, "one"))), root, Seq("id"), Seq("seq"), B)
    BucketedCdcState.applyBatch(mkLog(seed.map { case (i, _, _, _) => (i, 9L, 4, s"w$i") }),
      root, Seq("id"), Seq("seq"), B)
    assert(TableVersions.committedVersions(fs, rootPath) == Seq(0L, 1L, 2L))

    // a reader that just resolved v1 still reads most buckets from v0:
    // prune with a 2-commit window must keep v0 alive for it
    BucketedCdcState.prune(spark, root, keepHistory = 2)
    assert(fs.exists(TableVersions.dataDir(rootPath, 0L)),
      "v0 is referenced by v1's bucket map and must survive a 2-commit window")
    assert(bucketedState(root) == fullLogState(
      seed ++ Seq((1L, 5L, 4, "one")) ++ seed.map { case (i, _, _, _) => (i, 9L, 4, s"w$i") }))

    // with the window shrunk to the current commit only, v2 is
    // self-contained and the older versions can go
    BucketedCdcState.prune(spark, root, keepHistory = 1)
    assert(!fs.exists(TableVersions.dataDir(rootPath, 0L)))
    assert(!fs.exists(TableVersions.dataDir(rootPath, 1L)))
    assert(bucketedState(root).view.mapValues(_._3).toMap ==
      (1L to 40L).map(i => i -> s"w$i").toMap)
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

  test("tag-anchored reads fail fast on a root mixing tagged and untagged commits") {
    val root = Files.createTempDirectory("bstate_mixed").toString + "/t"
    // legacy untagged commit, then a tagged one share the root
    BucketedCdcState.applyBatch(mkLog(Seq((1L, 1L, 2, "a"))),
      root, Seq("id"), Seq("seq"), B)
    BucketedCdcState.applyBatch(mkLog(Seq((2L, 2L, 2, "b"))),
      root, Seq("id"), Seq("seq"), B, tag = Some(5L))
    // anchoring would silently skip the untagged v0 — must throw instead
    val e = intercept[IllegalArgumentException] {
      BucketedCdcState.statePartialBefore(spark, root,
        (0 until B).toSet, beforeTag = 6L)
    }
    assert(e.getMessage.contains("without a batch tag"), e.getMessage)
    // non-anchored reads of the same root keep working
    assert(BucketedCdcState.state(spark, root).get.count() == 2L)

    // a purely tagged root anchors normally
    val root2 = Files.createTempDirectory("bstate_tagged").toString + "/t"
    BucketedCdcState.applyBatch(mkLog(Seq((1L, 1L, 2, "a"))),
      root2, Seq("id"), Seq("seq"), B, tag = Some(0L))
    BucketedCdcState.applyBatch(mkLog(Seq((1L, 2L, 4, "a2"))),
      root2, Seq("id"), Seq("seq"), B, tag = Some(1L))
    val st = BucketedCdcState.statePartialBefore(spark, root2,
      (0 until B).toSet, beforeTag = 1L).get
    assert(st.select("v").as[String].collect().toSeq == Seq("a"))
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
