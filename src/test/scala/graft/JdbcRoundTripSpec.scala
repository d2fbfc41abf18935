package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcColumns, CdcMerge}
import graft.config.JdbcConnection
import graft.queries.Cdc
import graft.sinks.{JdbcDdl, JdbcMergedApply, JdbcSink}

/** End-to-end JDBC verification against embedded Derby (jars ship
  * with Spark in /opt/spark/jars): DDL create → distributed raw
  * append → incremental merged apply → `spark.read.jdbc` read-back.
  * Proves the whole reference JDBC surface
  * (cda-client JdbcOutputWriter.scala:285-497) live, not just up to
  * `.save()`.
  *
  * Tests share one embedded database and run in declaration order.
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val dbDir = {
    val d = Files.createTempDirectory("derby").toString
    System.setProperty("derby.system.home", d) // derby.log stays out of the repo
    d
  }
  private lazy val url = s"jdbc:derby:$dbDir/graftdb;create=true"
  private lazy val conn = JdbcConnection(url, "app", "graft", "APP")

  private def exec(sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try sqls.foreach(st.execute) finally st.close()
    } finally c.close()
  }

  private def readTable(t: String): DataFrame =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", s"APP.$t").load()

  /** The oracle-checked CDC fixture, columns fixed for a JDBC target. */
  private def coded: DataFrame =
    Cdc.codedEvents(spark, sf).select(
      col("user_id"), col("event_id"), col("event_type"), col("value"),
      col("ts"), col(CdcColumns.OperationCol), col(CdcColumns.SeqValCol))

  test("raw append: DDL create, distributed jdbc write, lossless read-back") {
    val raw = JdbcSink.rawFrame(coded)
    exec(JdbcDdl.createTableDdl(JdbcDdl.Derby, raw.schema, "APP.events_raw", JdbcDdl.Raw))
    JdbcSink.writeRaw(coded, conn, "events_raw")
    val back = readTable("events_raw")
    def norm(df: DataFrame) = df.select($"user_id", $"event_id", $"event_type", $"value",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
        col(CdcColumns.OperationCol), col(CdcColumns.SeqValCol))
      .as[(Long, Long, String, Double, String, Int, String)].collect().sorted.toSeq
    assert(back.count() == raw.count())
    assert(norm(back) == norm(raw))
  }

  test("merged write: read-back equals the oracle-checked cdc_apply_operations state") {
    val mergedFrame = JdbcSink.mergedFrame(coded, Seq("user_id"), Seq("ts", "event_id"))
    exec(JdbcDdl.createTableDdl(JdbcDdl.Derby, mergedFrame.schema, "APP.events_merged", JdbcDdl.Merged))
    JdbcSink.writeMerged(coded, conn, "events_merged", Seq("user_id"), Seq("ts", "event_id"))
    val back = readTable("events_merged")
      .select($"user_id", $"event_id".as("last_event_id"),
        $"value".as("last_value"), $"ts".as("last_ts"))
    val expected = Cdc.applyOperations(spark, sf) // the driver's oracle-gated query
    def norm(df: DataFrame) = df.select($"user_id", $"last_event_id", $"last_value",
        date_format($"last_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
      .as[(Long, Long, Double, String)].collect().sorted.toSeq
    assert(norm(back) == norm(expected))
  }

  test("incremental merged apply: two batches + stale replay == full-log latest-wins") {
    val full = coded // seqval = zero-padded hex(event_id): lexicographic == numeric
    val storedSchema = StructType(full.schema.fields
      .filterNot(_.name == CdcColumns.OperationCol)
      .map(f => if (f.name == "user_id") f.copy(nullable = false) else f))
    exec(
      JdbcDdl.createTableDdl(JdbcDdl.Derby, storedSchema, "APP.events_inc", JdbcDdl.Merged),
      JdbcDdl.primaryKeyDdl("APP.events_inc", Seq("user_id")))

    val batch1 = full.filter($"event_id" < 500)
    val batch2 = full.filter($"event_id" >= 500)
    JdbcMergedApply(batch1, conn, "events_inc", Seq("user_id"))
    JdbcMergedApply(batch2, conn, "events_inc", Seq("user_id"))

    val expected = CdcMerge.latestByKey(full, Seq("user_id"), Seq(CdcColumns.SeqValCol))
      .filter(col(CdcColumns.OperationCol) =!= CdcMerge.DeleteOp)
      .drop(CdcColumns.OperationCol)
    def norm(df: DataFrame) = df.select($"user_id", $"event_id", $"value",
        col(CdcColumns.SeqValCol))
      .as[(Long, Long, Double, String)].collect().sorted.toSeq
    val afterTwo = norm(readTable("events_inc"))
    assert(afterTwo == norm(expected))

    // replay of an already-applied batch: seqval guard blocks updates,
    // PK blocks inserts — table state must not change
    JdbcMergedApply(batch2, conn, "events_inc", Seq("user_id"))
    assert(norm(readTable("events_inc")) == afterTwo)
  }

  test("schema evolution: gate-generated ALTERs run live, evolved batch round-trips") {
    val existing = readTable("events_inc").schema
    val incoming = StructType(existing.fields :+ StructField("score", DoubleType, nullable = true))
    val stmts = JdbcDdl.alterAddColumnsDdl(JdbcDdl.Derby, existing, incoming, "APP.events_inc")
    assert(stmts == Seq("ALTER TABLE APP.events_inc ADD \"score\" DOUBLE PRECISION"))
    exec(stmts: _*)

    val ts = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val evolved = Seq(
      (9999901L, 9999901L, "purchase", 1.5, ts, 0, "ffffffffffffff01", 10.5),
      (9999902L, 9999902L, "purchase", 2.5, ts, 0, "ffffffffffffff02", 20.5))
      .toDF("user_id", "event_id", "event_type", "value", "ts",
        CdcColumns.OperationCol, CdcColumns.SeqValCol, "score")
    JdbcMergedApply(evolved, conn, "events_inc", Seq("user_id"))

    val back = readTable("events_inc")
    assert(back.filter($"user_id" === 9999901L).select("score").as[Double].head() == 10.5)
    assert(back.filter($"user_id" === 9999902L).select("score").as[Double].head() == 20.5)
    // pre-evolution rows read back with NULL in the new column
    assert(back.filter($"score".isNull).count() > 0)
  }

  test("client run loop exports raw + merged to Derby, then evolves on a new fingerprint") {
    import graft.client.GraftClient
    import graft.config.GraftConfig
    val work = Files.createTempDirectory("clientjdbc").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/sp"))
    Seq((1L, 2, "01", "a"), (1L, 4, "02", "b"), (2L, 2, "03", "c"),
      (3L, 2, "04", "d"), (3L, 1, "05", "d"))
      .toDF("id", "gwcbi___operation", "gwcbi___seqval_hex", "v")
      .write.parquet(s"$work/cdc/t1/fpA/100")
    def writeManifest(lastTs: String, history: String): Unit =
      Files.write(java.nio.file.Paths.get(s"$work/cdc/manifest.json"),
        s"""{"t1": {"lastSuccessfulWriteTimestamp": "$lastTs",
           |  "dataFilesPath": "$work/cdc/t1", "schemaHistory": $history}}""".stripMargin.getBytes)
    writeManifest("100", """{"fpA": "100"}""")
    exec("CREATE SCHEMA RAWS", "CREATE SCHEMA MERGEDS")
    val cfg = GraftConfig.fromYaml(
      s"""sourceLocation: {baseDir: $work/cdc, manifestPath: $work/cdc/manifest.json}
         |outputLocation: {path: $work/out}
         |savepointsLocation: {path: $work/sp}
         |outputSettings:
         |  exportTarget: jdbc
         |  saveIntoJdbcRaw: true
         |  saveIntoJdbcMerged: true
         |jdbcConnectionRaw:
         |  jdbcUrl: "$url"
         |  jdbcUsername: app
         |  jdbcPassword: x
         |  jdbcSchema: RAWS
         |jdbcConnectionMerged:
         |  jdbcUrl: "$url"
         |  jdbcUsername: app
         |  jdbcPassword: x
         |  jdbcSchema: MERGEDS
         |""".stripMargin)
    def read(schema: String): DataFrame =
      spark.read.format("jdbc").option("url", url)
        .option("dbtable", s"$schema.t1").load()

    val res = new GraftClient(spark, cfg).run()
    assert(res.size == 1 && res.head.rowsWritten == 5)
    assert(read("RAWS").count() == 5) // raw log: every op row appended
    val merged1 = read("MERGEDS").select($"id", $"v").as[(Long, String)].collect().toMap
    assert(merged1 == Map(1L -> "b", 2L -> "c")) // id 3 insert+delete → gone

    // new fingerprint at ts 200 adds column w: gate evolves both
    // targets, apply lands the new column
    Seq((2L, 4, "06", "c2", "w2"), (4L, 2, "07", "e", "w4"))
      .toDF("id", "gwcbi___operation", "gwcbi___seqval_hex", "v", "w")
      .write.parquet(s"$work/cdc/t1/fpB/200")
    writeManifest("200", """{"fpA": "100", "fpB": "200"}""")
    val res2 = new GraftClient(spark, cfg).run()
    assert(res2.head.rowsWritten == 2)
    assert(read("RAWS").count() == 7)
    val merged2 = read("MERGEDS").select($"id", $"v", $"w")
      .as[(Long, String, Option[String])].collect()
      .map { case (k, v, w) => k -> (v, w) }.toMap
    assert(merged2 == Map(1L -> ("b", None), 2L -> ("c2", Some("w2")), 4L -> ("e", Some("w4"))))
  }

  test("raw PK + secondary index DDL execute; PK rejects a duplicate raw row") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("gwcbi___operation", IntegerType),
      StructField("gwcbi___seqval_hex", StringType),
      StructField("publicid", StringType),
      StructField("body", StringType)))
    val insert = "INSERT INTO APP.policy (\"id\", \"gwcbi___operation\", " +
      "\"gwcbi___seqval_hex\", \"publicid\", \"body\") VALUES (1, 2, '01', 'p1', 'x')"
    exec(
      JdbcDdl.createTableDdl(JdbcDdl.Derby, schema, "APP.policy", JdbcDdl.Raw,
        largeTextFields = Set("policy.body")), // exercises the CLOB mapping
      JdbcDdl.primaryKeyDdl("APP.policy", JdbcDdl.Raw),
      JdbcDdl.secondaryIndexDdl("APP.policy").get,
      insert)
    val ex = intercept[java.sql.SQLException](exec(insert))
    assert(ex.getSQLState == "23505")
    assert(readTable("policy").count() == 1)
  }

  test("CDC-to-JDBC stream: microbatched merged apply converges; fresh-checkpoint replay is a no-op") {
    import graft.streaming.CdcStream
    val full = coded // seqval = zero-padded hex(event_id)
    val storedSchema = StructType(full.schema.fields
      .filterNot(_.name == CdcColumns.OperationCol)
      .map(f => if (f.name == "user_id") f.copy(nullable = false) else f))
    exec(
      JdbcDdl.createTableDdl(JdbcDdl.Derby, storedSchema, "APP.events_cdcs", JdbcDdl.Merged),
      JdbcDdl.primaryKeyDdl("APP.events_cdcs", Seq("user_id")))
    val work = Files.createTempDirectory("cdcjdbc")
    full.filter($"event_id" < 500).coalesce(1).write.parquet(s"$work/in/b=1")
    full.filter($"event_id" >= 500).coalesce(1).write.parquet(s"$work/in/b=2")
    def run(ck: String): Unit = {
      val stream = spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
      val q = CdcStream.startJdbc(stream, conn, "events_cdcs", Seq("user_id"),
        checkpointDir = ck)
      q.processAllAvailable(); q.stop()
    }
    run(s"$work/ck1")
    val expected = CdcMerge.latestByKey(full, Seq("user_id"), Seq(CdcColumns.SeqValCol))
      .filter(col(CdcColumns.OperationCol) =!= CdcMerge.DeleteOp)
      .drop(CdcColumns.OperationCol)
    def norm(df: DataFrame) = df.select($"user_id", $"event_id", $"value",
        col(CdcColumns.SeqValCol))
      .as[(Long, Long, Double, String)].collect().sorted.toSeq
    val after = norm(readTable("events_cdcs"))
    assert(after == norm(expected))
    // replay the WHOLE stream with a fresh checkpoint: every microbatch
    // re-applies; the seqval guard + PK make it a no-op
    run(s"$work/ck2")
    assert(norm(readTable("events_cdcs")) == after)
  }

  test("gate bypass: all-bypassed run skips without crashing; partial bypass holds the savepoint") {
    import graft.client.GraftClient
    import graft.config.GraftConfig
    val work = Files.createTempDirectory("clientbypass").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/sp"))
    Seq((1L, 2, "01", "a"), (2L, 2, "02", "b"))
      .toDF("id", "gwcbi___operation", "gwcbi___seqval_hex", "v")
      .write.parquet(s"$work/cdc/t1/fpA/100")
    Files.write(java.nio.file.Paths.get(s"$work/cdc/manifest.json"),
      s"""{"t1": {"lastSuccessfulWriteTimestamp": "100",
         |  "dataFilesPath": "$work/cdc/t1", "schemaHistory": {"fpA": "100"}}}""".stripMargin.getBytes)
    exec("CREATE SCHEMA RAWB", "CREATE SCHEMA MERGEDB",
      // pre-existing merged table where v is BIGINT: the string batch
      // is a type change -> gate Bypass
      "CREATE TABLE MERGEDB.t1 (\"id\" BIGINT, \"gwcbi___seqval_hex\" VARCHAR(64), \"v\" BIGINT)")
    def cfgFor(raw: Boolean): GraftConfig = GraftConfig.fromYaml(
      s"""sourceLocation: {baseDir: $work/cdc, manifestPath: $work/cdc/manifest.json}
         |outputLocation: {path: $work/out}
         |savepointsLocation: {path: $work/sp}
         |outputSettings:
         |  exportTarget: jdbc
         |  saveIntoJdbcRaw: $raw
         |  saveIntoJdbcMerged: true
         |jdbcConnectionRaw:
         |  jdbcUrl: "$url"
         |  jdbcUsername: app
         |  jdbcPassword: x
         |  jdbcSchema: RAWB
         |jdbcConnectionMerged:
         |  jdbcUrl: "$url"
         |  jdbcUsername: app
         |  jdbcPassword: x
         |  jdbcSchema: MERGEDB
         |""".stripMargin)

    // run 1: merged-only, bypassed -> warn-and-skip, savepoint untouched
    val res1 = new GraftClient(spark, cfgFor(raw = false)).run()
    assert(res1.size == 1 && res1.head.skipped && res1.head.rowsWritten == 0)
    assert(new graft.cdc.Savepoints(s"$work/sp").getAsLong("t1").isEmpty)

    // run 2: raw succeeds, merged still bypassed -> rows written but the
    // savepoint is held back so the merged target can catch up later
    val res2 = new GraftClient(spark, cfgFor(raw = true)).run()
    assert(res2.head.rowsWritten == 2 && res2.head.newSavepoint.isEmpty)
    def rawCount() = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "RAWB.t1").load().count()
    assert(rawCount() == 2)
    assert(new graft.cdc.Savepoints(s"$work/sp").getAsLong("t1").isEmpty)

    // run 3: the replay must NOT re-append raw (its per-target
    // watermark advanced) and must not crash — merged retried, still
    // bypassed, savepoint still held
    val res3 = new GraftClient(spark, cfgFor(raw = true)).run()
    assert(!res3.head.skipped && res3.head.newSavepoint.isEmpty)
    assert(rawCount() == 2, "raw batch was double-appended on replay")

    // fix the merged table -> run 4 applies merged and finally
    // advances the table savepoint
    exec("DROP TABLE MERGEDB.t1")
    val res4 = new GraftClient(spark, cfgFor(raw = true)).run()
    assert(res4.head.newSavepoint.contains("100"))
    assert(rawCount() == 2)
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "MERGEDB.t1").load().count() == 2) // ids 1,2 latest state
    val sp = new graft.cdc.Savepoints(s"$work/sp")
    assert(sp.getAsLong("t1").contains(100L))
    // catch-up watermarks retired once fully caught up: a manual
    // savepoint reset forces a true re-export again
    assert(!sp.snapshot.keySet.exists(_.contains("@")), sp.snapshot.toString)
  }

  test("double bypass matrix: both targets bypassed over two batches, staggered recovery, no double-apply") {
    import graft.client.GraftClient
    import graft.config.GraftConfig
    val work = Files.createTempDirectory("clientbypass2").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/sp"))
    def writeBatch(folder: String, rows: Seq[(Long, Int, String, String)]): Unit =
      rows.toDF("id", "gwcbi___operation", "gwcbi___seqval_hex", "v")
        .write.parquet(s"$work/cdc/t2/fpA/$folder")
    def writeManifest(ts: String): Unit =
      Files.write(java.nio.file.Paths.get(s"$work/cdc/manifest.json"),
        s"""{"t2": {"lastSuccessfulWriteTimestamp": "$ts",
           |  "dataFilesPath": "$work/cdc/t2", "schemaHistory": {"fpA": "100"}}}""".stripMargin.getBytes)
    // poison BOTH targets: pre-existing tables where v is BIGINT — the
    // string batch is a type change, so the schema gate bypasses each
    exec("CREATE SCHEMA RAWC", "CREATE SCHEMA MERGEDC",
      "CREATE TABLE RAWC.t2 (\"id\" BIGINT, \"gwcbi___operation\" INTEGER, " +
        "\"gwcbi___seqval_hex\" VARCHAR(64), \"v\" BIGINT)",
      "CREATE TABLE MERGEDC.t2 (\"id\" BIGINT, \"gwcbi___seqval_hex\" VARCHAR(64), \"v\" BIGINT)")
    val cfg = GraftConfig.fromYaml(
      s"""sourceLocation: {baseDir: $work/cdc, manifestPath: $work/cdc/manifest.json}
         |outputLocation: {path: $work/out}
         |savepointsLocation: {path: $work/sp}
         |outputSettings:
         |  exportTarget: jdbc
         |  saveIntoJdbcRaw: true
         |  saveIntoJdbcMerged: true
         |jdbcConnectionRaw:
         |  jdbcUrl: "$url"
         |  jdbcUsername: app
         |  jdbcPassword: x
         |  jdbcSchema: RAWC
         |jdbcConnectionMerged:
         |  jdbcUrl: "$url"
         |  jdbcUsername: app
         |  jdbcPassword: x
         |  jdbcSchema: MERGEDC
         |""".stripMargin)
    def sp = new graft.cdc.Savepoints(s"$work/sp")
    def count(schema: String) = spark.read.format("jdbc").option("url", url)
      .option("dbtable", s"$schema.t2").load().count()

    // batch 1 (ts 100): both targets bypassed -> warn-and-skip
    writeBatch("100", Seq((1L, 2, "01", "a"), (2L, 2, "02", "b")))
    writeManifest("100")
    val r1 = new GraftClient(spark, cfg).run()
    assert(r1.head.skipped && sp.getAsLong("t2").isEmpty)

    // batch 2 (ts 200) arrives with both targets STILL bypassed
    writeBatch("200", Seq((1L, 4, "03", "a2"), (3L, 2, "04", "c")))
    writeManifest("200")
    val r2 = new GraftClient(spark, cfg).run()
    assert(r2.head.skipped && sp.getAsLong("t2").isEmpty,
      "second consecutive double-bypass must hold the savepoint")
    assert(sp.snapshot.keySet.forall(!_.contains("@")),
      "no per-target watermark may advance on a bypassed run")

    // staggered recovery 1: fix ONLY raw -> raw applies BOTH pending
    // batches exactly once; merged still bypassed, savepoint held
    exec("DROP TABLE RAWC.t2")
    val r3 = new GraftClient(spark, cfg).run()
    assert(!r3.head.skipped && r3.head.newSavepoint.isEmpty)
    assert(count("RAWC") == 4, "raw must apply both pending batches once")
    assert(sp.getAsLong("t2").isEmpty && sp.getAsLong("t2@raw").contains(200L))

    // replay before merged recovers: raw must NOT re-append
    val r4 = new GraftClient(spark, cfg).run()
    assert(r4.head.newSavepoint.isEmpty)
    assert(count("RAWC") == 4, "raw double-applied while merged lagged")

    // staggered recovery 2: fix merged -> both caught up, savepoint
    // advances, catch-up watermarks retire
    exec("DROP TABLE MERGEDC.t2")
    val r5 = new GraftClient(spark, cfg).run()
    assert(r5.head.newSavepoint.contains("200"))
    assert(count("RAWC") == 4, "raw re-appended during merged catch-up")
    assert(count("MERGEDC") == 3, "merged latest state must hold ids 1,2,3")
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "MERGEDC.t2").load()
      .filter($"id" === 1L).select("v").as[String].collect().toSeq == Seq("a2"),
      "merged must carry the batch-2 update")
    assert(sp.getAsLong("t2").contains(200L))
    assert(sp.snapshot.keySet.forall(!_.contains("@")),
      "catch-up watermarks must retire once both targets are current")

    // steady state: nothing new -> clean no-op
    val r6 = new GraftClient(spark, cfg).run()
    assert(r6.head.skipped && count("RAWC") == 4)
  }

  test("duplicate-key detection spans vendors but never swallows other violations") {
    import java.sql.SQLException
    import graft.sinks.JdbcMergedApply.isDuplicateKey
    assert(isDuplicateKey(new SQLException("dup", "23505")))          // Derby/Postgres
    assert(isDuplicateKey(new SQLException("dup", "23000", 1)))       // ORA-00001
    assert(isDuplicateKey(new SQLException("dup", "23000", 2627)))    // SQL Server PK
    assert(isDuplicateKey(new SQLException("dup", "23000", 2601)))    // SQL Server unique idx
    assert(isDuplicateKey(new SQLException("dup", "23000", 1062)))    // MySQL
    // NOT NULL / FK / CHECK / unknown-23000 must propagate, not vanish
    assert(!isDuplicateKey(new SQLException("not null", "23502")))
    assert(!isDuplicateKey(new SQLException("fk", "23503")))
    assert(!isDuplicateKey(new SQLException("check", "23514")))
    assert(!isDuplicateKey(new SQLException("ora not null", "23000", 1400)))
    assert(!isDuplicateKey(new SQLException("syntax", "42X01")))
    assert(!isDuplicateKey(new SQLException("no state")))
  }
}
