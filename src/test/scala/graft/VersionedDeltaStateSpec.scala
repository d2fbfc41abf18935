package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.TableVersions
import graft.streaming.VersionedDeltaState

/** The shared versioned state chain behind StreamLineDedup /
  * StreamNearDedup: replay anchoring, consolidation no-op on replay,
  * prune bounds, and the zombie-writer fencing inherited from
  * TableVersions.
  */
class VersionedDeltaStateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def hashes(root: String, beforeTag: Long): Seq[Long] =
    VersionedDeltaState.stateBefore(spark, root, beforeTag)
      .map(_.as[Long].collect().toSeq.sorted).getOrElse(Nil)

  test("replayed append supersedes its first attempt instead of stacking on it") {
    val root = Files.createTempDirectory("vds_replay").toString
    VersionedDeltaState.append(spark, root, Seq(1L, 2L).toDF("__lh"), tag = 0L)
    VersionedDeltaState.append(spark, root, Seq(3L).toDF("__lh"), tag = 1L)
    val first = hashes(root, 2L)
    assert(first == Seq(1L, 2L, 3L))
    // replay of batch 1: anchors to the pre-batch snapshot (tag < 1),
    // so the new commit's segment list drops the first attempt
    VersionedDeltaState.append(spark, root, Seq(3L).toDF("__lh"), tag = 1L)
    assert(hashes(root, 2L) == Seq(1L, 2L, 3L)) // no duplicate segment
    val segs = VersionedDeltaState.segmentsBefore(spark, root, 2L)
    assert(segs.size == 2, segs.mkString(",")) // batch 0 + ONE batch-1 segment
  }

  test("zero-row delta carries the anchor's segment list forward") {
    val root = Files.createTempDirectory("vds_empty").toString
    VersionedDeltaState.append(spark, root, Seq(9L).toDF("__lh"), tag = 0L)
    VersionedDeltaState.append(spark, root,
      Seq.empty[Long].toDF("__lh"), tag = 1L)
    assert(hashes(root, 2L) == Seq(9L))
    assert(VersionedDeltaState.segmentsBefore(spark, root, 2L).size == 1)
  }

  test("consolidate merges segments once; a replay no-ops; prune reclaims") {
    val root = Files.createTempDirectory("vds_compact").toString
    (0L until 6L).foreach(b =>
      VersionedDeltaState.append(spark, root, Seq(b).toDF("__lh"), tag = b))
    assert(VersionedDeltaState.segmentsBefore(spark, root, 6L).size == 6)
    VersionedDeltaState.consolidate(spark, root, 6L, merge = _.distinct())
    assert(VersionedDeltaState.segmentsBefore(spark, root, 6L).size == 1)
    assert(hashes(root, 6L) == (0L until 6L).toSeq)
    // replayed consolidation anchors to its first attempt and no-ops
    VersionedDeltaState.consolidate(spark, root, 6L, merge = _.distinct())
    assert(VersionedDeltaState.segmentsBefore(spark, root, 6L).size == 1)
    // replay anchors keep pre-consolidation versions alive (a re-run
    // of batch 5 must still see the state as of batch 4); two more
    // batches age them out, then prune reclaims
    VersionedDeltaState.append(spark, root, Seq(6L).toDF("__lh"), tag = 6L)
    VersionedDeltaState.append(spark, root, Seq(7L).toDF("__lh"), tag = 7L)
    VersionedDeltaState.consolidate(spark, root, 8L, merge = _.distinct())
    VersionedDeltaState.prune(spark, root)
    val dirs = Option(new java.io.File(root).listFiles()).get
      .map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    assert(dirs.size <= 4, dirs.mkString(","))
    assert(hashes(root, 9L) == (0L until 8L).toSeq) // still readable after prune
  }

  test("property: arbitrary replay schedules converge to the unique-batch union") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // a checkpointed stream replays only its newest uncommitted batch,
    // so a schedule is: for each batch id in order, 1..3 applications
    // (original + replays), with consolidation at a random cadence.
    // Whatever the schedule, the visible state must equal the union of
    // one delta per batch id.
    val gen = for {
      nBatches <- Gen.choose(3, 7)
      repeats <- Gen.listOfN(nBatches, Gen.choose(1, 3))
      every <- Gen.choose(2, 4)
    } yield (nBatches, repeats, every)
    val prop = Prop.forAll(gen) { case (nBatches, repeats, every) =>
      val root = Files.createTempDirectory("vds_prop").toString
      (0 until nBatches).foreach { b =>
        if (b > 0 && b % every == 0) {
          VersionedDeltaState.consolidate(spark, root, b, merge = _.distinct())
          VersionedDeltaState.prune(spark, root)
        }
        (0 until repeats(b)).foreach { _ =>
          VersionedDeltaState.append(spark, root,
            Seq(b.toLong * 10, b.toLong * 10 + 1).toDF("__lh"), tag = b.toLong)
        }
      }
      val want = (0 until nBatches)
        .flatMap(b => Seq(b.toLong * 10, b.toLong * 10 + 1)).sorted
      hashes(root, nBatches.toLong) == want
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("zombie writer is fenced: late commit fails version-taken, state intact") {
    val root = Files.createTempDirectory("vds_zombie").toString
    VersionedDeltaState.append(spark, root, Seq(1L).toDF("__lh"), tag = 0L)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a zombie driver reserves the next version, then stalls; the
    // successor commits the same batch through the helper first
    val zombie = TableVersions.begin(fs, rootPath)
    VersionedDeltaState.append(spark, root, Seq(2L).toDF("__lh"), tag = 1L)
    // the zombie wrote only into its own token-named staging dir —
    // nothing of it can appear in the committed version
    fs.create(new Path(zombie.dir, "zombie-scribble"), true).close()
    val committed = TableVersions.dataDir(rootPath, zombie.version)
    assert(!fs.exists(new Path(committed, "zombie-scribble")),
      "zombie data leaked into the successor's committed version")
    val e = intercept[IllegalArgumentException](
      TableVersions.commit(fs, rootPath, zombie))
    assert(e.getMessage.contains("already committed"))
    assert(hashes(root, 2L) == Seq(1L, 2L))
  }
}
