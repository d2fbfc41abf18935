package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.client.GraftClient
import graft.config.GraftConfig
import graft.plans.GraftExtensions

/** CLI argument failures (reference: CLIArgumentExceptions.scala). */
final case class CliArgumentException(message: String)
  extends IllegalArgumentException(message)

/** Parsed CLI arguments (reference: CLIArgumentsProcessor.scala):
  * `--configPath/-c <yaml>` (required), `--tableName/-t <name>`
  * (optional single-table run), `--merged` (apply CDC ops before
  * writing).
  */
final case class CliArguments(configFilePath: String,
                              singleTableValue: String = "",
                              merged: Boolean = false)

object CliArguments {
  def parse(args: Seq[String]): CliArguments = {
    var config: Option[String] = None
    var table = ""
    var merged = false
    var rest = args.toList
    while (rest.nonEmpty) rest match {
      case ("--configPath" | "-c") :: v :: tail => config = Some(v); rest = tail
      case ("--tableName" | "-t") :: v :: tail => table = v; rest = tail
      case "--merged" :: tail => merged = true; rest = tail
      case other :: _ => throw CliArgumentException(s"Unknown argument: $other")
      case Nil => ()
    }
    val cfgPath = config.getOrElse(
      throw CliArgumentException("Missing required argument: --configPath/-c"))
    if (!Files.exists(Paths.get(cfgPath)))
      throw CliArgumentException(s"Config file does not exist: $cfgPath")
    CliArguments(cfgPath, table, merged)
  }
}

/** `graft` CLI entrypoint:
  * {{{ sbt "runMain graft.cli.Main -c config.yaml [-t table] [--merged]" }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cli = CliArguments.parse(args.toIndexedSeq)
    val cfg = GraftConfig.fromYaml(
      new String(Files.readAllBytes(Paths.get(cli.configFilePath)), "UTF-8"))
    val spark = SparkSession.builder()
      .appName("graft-client")
      .master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${cfg.performanceTuning.numberOfJobsInParallelMaxCount}]"))
      .config("spark.sql.shuffle.partitions",
        cfg.performanceTuning.numberOfJobsInParallelMaxCount.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.maxResultSize", cfg.sparkTuning.maxResultSize)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val results = new GraftClient(spark, cfg).run(cli.singleTableValue, cli.merged)
      results.sortBy(_.tableName).foreach { r =>
        if (r.skipped) println(s"[graft] ${r.tableName}: no new data")
        else println(s"[graft] ${r.tableName}: ${r.rowsWritten} rows -> ${r.outputPath} " +
          s"(savepoint=${r.newSavepoint.getOrElse("-")})")
      }
    } finally spark.stop()
  }
}
