package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BatchDirs

/** Tiered consolidation of per-batch output dirs: results never
  * change, the directory count stays logarithmic in stream length, and
  * lifetime merge I/O is O(T log T) — each batch's rows are re-read
  * O(log T) times, not once per later consolidation.
  */
class BatchDirsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def dirNames(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq

  private def writeBatch(root: String, id: Long, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/batch_$id")
  }

  test("tiered consolidation: equal results, O(log) dirs, O(log) rereads per batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("bd_tiered").toString
    val T = 64
    val K = 4
    val rowsPerBatch = 5
    var mergedRowsTotal = 0L
    val counting: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => { mergedRowsTotal += df.count(); df }
    (0 until T).foreach { b =>
      writeBatch(root, b, (0 until rowsPerBatch).map(i => (b * 100L + i, b.toLong)))
      if (b > 0 && b % K == 0) BatchDirs.consolidate(spark, root, b, merge = counting)
    }
    val got = BatchDirs.read(spark, root).as[(Long, Long)].collect().toSeq.sorted
    val want = (0 until T).flatMap(b =>
      (0 until rowsPerBatch).map(i => (b * 100L + i, b.toLong))).sorted
    assert(got == want)

    // logarithmic chain, not one compact per consolidation
    val compacts = dirNames(root).filter(_.startsWith("compact_"))
    val bound = 63 - java.lang.Long.numberOfLeadingZeros(T.toLong / K) + 2
    assert(compacts.size <= bound, s"${compacts.size} compacts: $compacts")
    assert(dirNames(root).count(_.startsWith("batch_")) <= K)

    // lifetime merge I/O: binary-counter schedule re-reads each row
    // O(log(T/K)) times — a single ever-growing compact would make
    // this ~ (T/K)/2 * T rows (quadratic)
    val totalRows = (T - K).toLong * rowsPerBatch // last tail never consolidated
    val maxRereads = 63 - java.lang.Long.numberOfLeadingZeros(T.toLong / K) + 2
    assert(mergedRowsTotal <= totalRows * maxRereads,
      s"merged $mergedRowsTotal rows; bound ${totalRows * maxRereads}")
  }

  test("latest-wins merge stays correct across tiers") {
    import spark.implicits._
    val root = Files.createTempDirectory("bd_lw").toString
    // key 7 is re-emitted (corrected) in several later batches; a
    // latest-wins resolve must keep only the newest emission no matter
    // which tier each emission was absorbed into
    val resolve: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.groupBy("k")
        .agg(max(struct(col("__b"), col("v"))).as("m"))
        .select(col("k"), col("m.v").as("v"))
    (0 until 24).foreach { b =>
      writeBatch(root, b, Seq((7L, b.toLong), (b * 100L + 50, b.toLong)))
      if (b > 0 && b % 4 == 0)
        BatchDirs.consolidate(spark, root, b, merge = resolve, idCol = Some("__b"))
    }
    val res = resolve(BatchDirs.read(spark, root, idCol = Some("__b")))
      .as[(Long, Long)].collect().toMap
    assert(res(7L) == 23L) // the newest correction wins
    assert(res.size == 25) // 24 unique keys + key 7
  }

  test("cleanup sweeps marker-only and leaked dirs at or below the floor") {
    import spark.implicits._
    val root = Files.createTempDirectory("bd_sweep").toString
    (0 until 4).foreach(b => writeBatch(root, b, Seq((b.toLong, b.toLong))))
    // a zero-row emission: _SUCCESS marker but no parquet file
    val markerOnly = new java.io.File(s"$root/batch_1")
    markerOnly.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    markerOnly.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    assert(markerOnly.exists() && new java.io.File(markerOnly, "_SUCCESS").exists())
    // a half-written batch dir (no _SUCCESS) below the floor
    val half = new java.io.File(s"$root/batch_0/_SUCCESS")
    half.delete()
    BatchDirs.consolidate(spark, root, 4)
    val names = dirNames(root)
    assert(!names.contains("batch_0"), names.mkString(","))
    assert(!names.contains("batch_1"), names.mkString(","))
    assert(names.count(_.startsWith("compact_")) == 1)
    // surviving content = the two complete, non-empty inputs
    val got = BatchDirs.read(spark, root).as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((2L, 2L), (3L, 3L)))
  }

  test("marker-only compact (merge emptied its inputs) is recognized as complete") {
    import spark.implicits._
    val root = Files.createTempDirectory("bd_empty").toString
    // a merge callback may legitimately map non-empty inputs to zero
    // rows (a resolve that filters all tombstones)
    val dropAll: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.filter(lit(false))
    (0 until 4).foreach(b => writeBatch(root, b, Seq((b.toLong, b.toLong))))
    BatchDirs.consolidate(spark, root, 4, merge = dropAll)
    // force the marker-only shape regardless of whether this Spark
    // version writes an empty schema-carrying part file
    val compact = Option(new java.io.File(root).listFiles()).get
      .find(_.getName.startsWith("compact_")).get
    compact.listFiles().filter(f => f.getName.endsWith(".parquet") ||
      f.getName.endsWith(".crc")).foreach(_.delete())
    val success = new java.io.File(compact, "_SUCCESS")
    assert(success.exists())
    // crash window: inputs re-appear next to the complete marker-only
    // target (consolidation killed between write and sweep)
    (1 until 3).foreach(b => writeBatch(root, b, Seq((b.toLong, b.toLong))))
    val mtime = success.lastModified()
    Thread.sleep(20)
    BatchDirs.consolidate(spark, root, 4, merge = dropAll)
    // recognized → sweep-only: leftovers removed, target NOT rebuilt
    val names = dirNames(root)
    assert(!names.exists(_.startsWith("batch_")), names.mkString(","))
    assert(success.exists() && success.lastModified() == mtime,
      "marker-only compact was rebuilt instead of recognized")
    // later batches continue normally on top of the marker
    (4 until 6).foreach(b => writeBatch(root, b, Seq((b.toLong, b.toLong))))
    val got = BatchDirs.read(spark, root).as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((4L, 4L), (5L, 5L)))
  }

  test("crash-sweep: a complete target with still-present inputs only re-runs cleanup") {
    import spark.implicits._
    val root = Files.createTempDirectory("bd_crash").toString
    (0 until 8).foreach(b => writeBatch(root, b, Seq((b.toLong, b.toLong))))
    BatchDirs.consolidate(spark, root, 4) // compact_3
    BatchDirs.consolidate(spark, root, 8) // absorbs compact_3 → compact_7
    val after = BatchDirs.read(spark, root).as[(Long, Long)].collect().toSeq.sorted
    assert(after == (0 until 8).map(b => (b.toLong, b.toLong)).sorted)
    // simulate the crash window: re-create an absorbed input next to
    // the complete target — the reader must not double-count it, and a
    // replayed consolidation must sweep it
    writeBatch(root, 5, Seq((5L, 5L)))
    val reread = BatchDirs.read(spark, root).as[(Long, Long)].collect().toSeq.sorted
    assert(reread == after, "leaked absorbed batch dir was double-read")
    BatchDirs.consolidate(spark, root, 8)
    assert(!dirNames(root).contains("batch_5"))
  }
}
