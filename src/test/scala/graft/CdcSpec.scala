package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._
import graft.sources.CdcBatchReader

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run `f` expecting a refusal; return the FULL message chain.
    * In-plan refusals (raise_error inside the query — the r16
    * guard convention) surface as SparkException-wrapped
    * SparkRuntimeException at action time, driver-side `require`
    * refusals as IllegalArgumentException — this accepts both and
    * lets the caller assert on the message text.
    */
  def refusalMessage(f: => Any): String = {
    val t = try { f; null } catch { case e: Throwable => e }
    Predef.assert(t != null, "expected a refusal, got none")
    Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }
}

class CdcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("latestByKey keeps the max-sequence row per key") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 30L, "c"), (1L, 20L, "b"),
      (2L, 5L, "x")).toDF("id", "seq", "v")
    val got = CdcMerge.latestByKey(df, Seq("id"), Seq("seq"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 30L, "c"), (2L, 5L, "x")))
  }

  test("applyOperations: upsert latest-wins, delete removes key") {
    val df = Seq(
      (1L, 1L, 2, "ins"), (1L, 2L, 4, "upd"),        // id 1: insert then update
      (2L, 3L, 2, "ins"), (2L, 4L, 1, "del"),        // id 2: deleted
      (3L, 5L, 1, "del"), (3L, 6L, 2, "resurrect")   // id 3: delete anywhere in batch wins
    ).toDF("id", "seq", "gwcbi___operation", "v")
    val got = CdcMerge.applyOperations(df, Seq("id"), Seq("seq"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "upd"))
  }

  test("snapshot diff replayed through applyOperations reproduces v2") {
    import org.apache.spark.sql.functions._
    // v1 -> v2: key 2 updated, key 3 deleted, key 4 inserted
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v")
    val delta = SnapshotDiff.diff(v1, v2, Seq("id"))
    val ops = delta.select($"id", $"v", col(CdcColumns.OperationCol))
      .as[(Long, String, Int)].collect().toSet
    assert(ops == Set((2L, "B", 4), (3L, "c", 1), (4L, "d", 2)))
    // replay: v1 as baseline inserts (seq 0), delta on top (seq 1)
    val log = v1.withColumn(CdcColumns.OperationCol, lit(2)).withColumn("seq", lit(0))
      .unionByName(delta.withColumn("seq", lit(1)))
    val replayed = CdcMerge.applyOperations(log, Seq("id"), Seq("seq"))
      .select("id", "v").as[(Long, String)].collect().toSet
    val want = v2.as[(Long, String)].collect().toSet
    assert(replayed == want, s"replay mismatch: $replayed vs $want")
  }

  test("columnChurn survives SQL-significant column names (quotes, dots, backticks)") {
    import org.apache.spark.sql.functions._
    // hostile payload names: a quote, a dot, a backtick — any of these
    // broke the old interpolated stack() selectExpr at runtime
    val cols = Seq("id", "it's", "a.b", "t`ick")
    val v1 = Seq((1L, "x", "y", "z"), (2L, "x", "y", "z")).toDF(cols: _*)
    val v2 = Seq((1L, "x", "Y", "z"), (3L, "n", "n", "n")).toDF(cols: _*)
    val churn = SnapshotDiff.columnChurn(v1, v2, Seq("id"))
      .select($"col_name", $"n_changed", $"n_overlap", $"n_inserted", $"n_deleted")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(churn.keySet == Set("it's", "a.b", "t`ick"))
    assert(churn("a.b") == ((1L, 1L, 1L, 1L)))   // key 1 changed col a.b
    assert(churn("it's") == ((0L, 1L, 1L, 1L)))
    assert(churn("t`ick") == ((0L, 1L, 1L, 1L)))
  }

  test("dropInternal keeps operation/seqval, drops other gwcbi___ cols") {
    val df = Seq((1L, 2, "ff", "x")).toDF("id", "gwcbi___operation", "gwcbi___seqval_hex", "gwcbi___lsn")
    val out = CdcColumns.dropInternal(df)
    assert(out.columns.toSet == Set("id", "gwcbi___operation", "gwcbi___seqval_hex"))
  }

  test("dropAllInternal optionally keeps seqval (merged-sink shape)") {
    val df = Seq((1L, 2, "ff", "fp", "100")).toDF(
      "id", "gwcbi___operation", "gwcbi___seqval_hex",
      "gwcdac__fingerprintfolder", "gwcdac__timestampfolder")
    assert(CdcColumns.dropAllInternal(df).columns.toSet == Set("id", "gwcbi___seqval_hex"))
    assert(CdcColumns.dropAllInternal(df, keepSeqVal = false).columns.toSet == Set("id"))
  }

  test("forJdbcTarget renames interval and drops spatial/textdata") {
    val df = Seq((1L, 2, 3, 4, 5)).toDF("id", "interval", "geo_spatial", "textdata", "ok")
    assert(CdcColumns.forJdbcTarget(df).columns.toSet == Set("id", "interval_", "ok"))
  }

  test("unionEvolved null-fills missing columns") {
    val oldFp = Seq((1L, "a")).toDF("id", "v")
    val newFp = Seq((2L, "b", 9.9)).toDF("id", "v", "score")
    val out = SchemaEvolution.unionEvolved(Seq(oldFp, newFp))
    assert(out.columns.toSet == Set("id", "v", "score"))
    assert(out.filter($"id" === 1L).select("score").first().isNullAt(0))
    assert(SchemaEvolution.addedColumns(oldFp, newFp) == Seq("score"))
  }

  test("savepoints round-trip and upsert") {
    val dir = Files.createTempDirectory("sp").toString
    val sp = new Savepoints(dir)
    assert(sp.get("t1").isEmpty)
    sp.write("t1", "100")
    sp.write("t1", "200")
    sp.write("t2", "50")
    val reread = new Savepoints(dir)
    assert(reread.getAsLong("t1").contains(200L))
    assert(reread.snapshot == Map("t1" -> "200", "t2" -> "50"))
  }

  test("manifest parse, filter, pending fingerprints") {
    val json =
      """{"taccount": {"lastSuccessfulWriteTimestamp": "300",
        |  "totalProcessedRecordsCount": 240000,
        |  "dataFilesPath": "/data/taccount",
        |  "schemaHistory": {"fpA": "100", "fpB": "250"}},
        | "tnote": {"lastSuccessfulWriteTimestamp": "400",
        |  "totalProcessedRecordsCount": 1,
        |  "dataFilesPath": "/data/tnote",
        |  "schemaHistory": {"fpX": "50"}}}""".stripMargin
    val m = Manifest.parseJson(json)
    assert(m.keySet == Set("taccount", "tnote"))
    assert(m("taccount").lastSafeTimestamp == 300L)
    assert(Manifest.filterTables(m, "tnote").keySet == Set("tnote"))
    assert(Manifest.filterTables(m, "").keySet == m.keySet)
    val e = m("taccount")
    // savepoint before fpB's start: both fingerprints pending
    assert(Manifest.fingerprintsWithUnprocessedRecords(e, Some(120L)) == Seq("fpA", "fpB"))
    // savepoint past fpA's interval end (250): only fpB pending
    assert(Manifest.fingerprintsWithUnprocessedRecords(e, Some(260L)) == Seq("fpB"))
    assert(Manifest.fingerprintsWithUnprocessedRecords(e, None) == Seq("fpA", "fpB"))
  }

  test("CdcBatchReader reads layout incrementally with provenance") {
    import spark.implicits._
    val base = Files.createTempDirectory("cdc").toString
    // fingerprint fpA: folders 100, 200 (old schema); fpB: folder 300 (adds score)
    Seq((1L, 10, "a")).toDF("id", "gwcbi___operation", "v")
      .write.parquet(s"$base/t/fpA/100")
    Seq((2L, 4, "b")).toDF("id", "gwcbi___operation", "v")
      .write.parquet(s"$base/t/fpA/200")
    Seq((3L, 4, "c", 1.5)).toDF("id", "gwcbi___operation", "v", "score")
      .write.parquet(s"$base/t/fpB/300")
    val entry = ManifestEntry("300", 3, s"$base/t", Map("fpA" -> "100", "fpB" -> "300"))

    val all = CdcBatchReader.readTable(spark, "t", entry, savepoint = None).get
    assert(all.count() == 3)
    assert(all.columns.contains("gwcdac__fingerprintfolder"))
    val byId = all.select($"id", $"gwcdac__timestampfolder").as[(Long, String)].collect().toMap
    assert(byId == Map(1L -> "100", 2L -> "200", 3L -> "300"))
    assert(all.filter($"id" === 1L).select("score").first().isNullAt(0))

    // savepoint at 200: only folder 300 remains
    val inc = CdcBatchReader.readTable(spark, "t", entry, savepoint = Some(200L)).get
    assert(inc.select("id").as[Long].collect().toSeq == Seq(3L))
    // savepoint at the end: nothing new
    assert(CdcBatchReader.readTable(spark, "t", entry, savepoint = Some(300L)).isEmpty)
    // maxTimestamp drives the next savepoint
    assert(CdcBatchReader.maxTimestamp(
      CdcBatchReader.listBatches("t", entry, None)).contains(300L))
  }

  test("survivorship golden record: per-field latest non-null, not whole-row") {
    import spark.implicits._
    // entity 1: three partial updates — the golden record mixes fields
    // from DIFFERENT rows (seq 3's name, seq 2's email, seq 1's phone);
    // whole-row latest-wins would return (n3, null, null)
    val updates = Seq(
      (1L, 1L, Some("n1"), Some("e1"), Some("p1")),
      (1L, 2L, Some("n2"), Some("e2"), None),
      (1L, 3L, Some("n3"), None, None),
      (2L, 1L, None, None, None), // never-present fields stay null
      (2L, 2L, Some("x"), None, None)
    ).toDF("key", "seq", "name", "email", "phone")
    val got = Survivorship.goldenRecord(updates, "key", Seq("seq"),
        Seq("name", "email", "phone"))
      .as[(Long, Option[String], Option[String], Option[String], Long, Long)]
      .collect().sortBy(_._1)
    assert(got(0) === ((1L, Some("n3"), Some("e2"), Some("p1"), 3L, 3L)))
    assert(got(1) === ((2L, Some("x"), None, None, 2L, 2L)))
    // composite seq: (batch, seqno) — later batch wins over higher seqno
    val comp = Seq(
      (9L, 1L, 5L, Some("old-batch-high-seq")),
      (9L, 2L, 1L, Some("new-batch"))
    ).toDF("key", "batch", "seqno", "name")
    val g2 = Survivorship.goldenRecord(comp, "key", Seq("batch", "seqno"),
        Seq("name"))
      .as[(Long, Option[String], Long, Long)].collect()
    assert(g2.head._2 === Some("new-batch"))
    // refusals
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(updates, "key", Nil, Seq("name"))
    }
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(updates, "key", Seq("seq"), Nil)
    }
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(updates, "key", Seq("seq"), Seq("key"))
    }
  }
}
