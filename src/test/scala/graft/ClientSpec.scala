package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.{CliArgumentException, CliArguments}
import graft.client.GraftClient
import graft.config.GraftConfig

class ClientSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def buildWorkspace(): (String, GraftConfig) = {
    val work = Files.createTempDirectory("client").toString
    Files.createDirectories(Paths.get(s"$work/sp"))
    // two tables, each one fingerprint with one timestamp folder
    Seq((1L, 2, "a"), (2L, 4, "b")).toDF("id", "gwcbi___operation", "v")
      .write.parquet(s"$work/cdc/t1/fpA/100")
    Seq((9L, 2, "z")).toDF("id", "gwcbi___operation", "v")
      .write.parquet(s"$work/cdc/t2/fpB/100")
    Files.write(Paths.get(s"$work/cdc/manifest.json"),
      s"""{"t1": {"lastSuccessfulWriteTimestamp": "100", "dataFilesPath": "$work/cdc/t1",
         |  "schemaHistory": {"fpA": "100"}},
         | "t2": {"lastSuccessfulWriteTimestamp": "100", "dataFilesPath": "$work/cdc/t2",
         |  "schemaHistory": {"fpB": "100"}}}""".stripMargin.getBytes)
    val cfg = GraftConfig.fromYaml(
      s"""sourceLocation: {baseDir: $work/cdc, manifestPath: $work/cdc/manifest.json}
         |outputLocation: {path: $work/out}
         |savepointsLocation: {path: $work/sp}
         |outputSettings: {exportTarget: file, fileFormat: parquet}
         |""".stripMargin)
    (work, cfg)
  }

  test("client runs all tables, writes layout, commits savepoints, then no-ops") {
    val (work, cfg) = buildWorkspace()
    val client = new GraftClient(spark, cfg)
    val results = client.run()
    assert(results.size == 2)
    assert(results.forall(r => !r.skipped && r.rowsWritten > 0))
    val t1 = results.find(_.tableName == "t1").get
    assert(t1.outputPath == s"$work/out/t1/fpA")
    assert(t1.rowsWritten == 2)
    assert(t1.newSavepoint.contains("100"))
    // second run: savepoints make everything a no-op
    val again = client.run()
    assert(again.forall(_.skipped))
  }

  test("client single-table filter and per-table failure isolation") {
    val (work, cfg) = buildWorkspace()
    // corrupt t2's parquet folder to force a per-table failure
    val bad = Paths.get(s"$work/cdc/t2/fpB/100")
    Files.list(bad).iterator().forEachRemaining(p =>
      if (p.toString.endsWith(".parquet")) Files.write(p, "garbage".getBytes))
    val client = new GraftClient(spark, cfg)
    val only1 = client.run(singleTableName = "t1")
    assert(only1.map(_.tableName) == Seq("t1"))
    val all = new GraftClient(spark, cfg).run()
    val t2 = all.find(_.tableName == "t2").get
    assert(t2.skipped, "failed table must be isolated, not crash the run")
  }

  test("cli argument parsing and validation") {
    val tmp = Files.createTempFile("cfg", ".yaml").toString
    val a = CliArguments.parse(Seq("-c", tmp, "-t", "t1", "--merged"))
    assert(a == CliArguments(tmp, "t1", merged = true))
    assertThrows[CliArgumentException](CliArguments.parse(Seq("-t", "t1")))
    assertThrows[CliArgumentException](CliArguments.parse(Seq("-c", "/nope/x.yaml")))
    assertThrows[CliArgumentException](CliArguments.parse(Seq("-c", tmp, "--wat")))
  }
}
