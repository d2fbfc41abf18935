package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Composable corpus-preparation pipeline with per-stage attrition
  * reporting (SURVEY §2c row 63) — the end-to-end shape a
  * training-data job actually runs: quality gate → dedup →
  * decontaminate → ..., where each stage is any DataFrame → DataFrame
  * transform and the operator tells you how many documents each
  * stage cost.
  *
  * The reporting uses Spark's `Observation` metrics: one `observe`
  * count is attached at every stage boundary, so a SINGLE
  * materialization of the final result harvests every stage's
  * in/out count from the same job — no per-stage `count()` actions,
  * no caching of intermediates, no re-execution. At 100 TB the
  * attrition report is free: the counts ride the pass the pipeline
  * was going to make anyway.
  *
  * (A stage whose internals re-scan its input — e.g. near-dup drop
  * joining the corpus against its own pair table — still owns that
  * cost; the operator adds nothing on top.)
  */
object CorpusPipeline {

  /** One stage: a name for the report and the transform itself. */
  case class Stage(name: String, transform: DataFrame => DataFrame)

  /** The chained frame plus the observations to harvest after an
    * action has materialized it.
    */
  final class Planned private[CorpusPipeline] (
      val result: DataFrame,
      private[CorpusPipeline] val obs: Seq[(String, Observation)]) {

    /** Harvest the report AFTER `result` has been materialized by an
      * action (write, count, collect...). Blocks until the metrics
      * exist; rows are (stage, docs_in, docs_out, docs_dropped) in
      * pipeline order.
      */
    def report(): DataFrame = {
      val counts = obs.map { case (name, o) =>
        name -> (o.get("n") match {
          case n: Long => n
          case n: Number => n.longValue()
        })
      }
      val spark = result.sparkSession
      val rows = counts.sliding(2).collect {
        case Seq((_, in), (stage, out)) => (stage, in, out, in - out)
      }.toSeq
      spark.createDataFrame(rows)
        .toDF("stage", "docs_in", "docs_out", "docs_dropped")
    }
  }

  /** Chain `stages` over `corpus` with a boundary observation before
    * the first stage and after every stage.
    */
  def plan(corpus: DataFrame, stages: Seq[Stage]): Planned = {
    require(stages.nonEmpty, "pipeline needs at least one stage")
    val names = stages.map(_.name)
    require(names.distinct == names, s"duplicate stage names: $names")
    var obs = Vector("input" -> new Observation())
    var df = corpus.observe(obs.head._2, count(lit(1)).as("n"))
    stages.foreach { s =>
      val o = new Observation()
      obs :+= (s.name -> o)
      df = s.transform(df).observe(o, count(lit(1)).as("n"))
    }
    new Planned(df, obs)
  }

  /** Run the pipeline to completion and return (result, report). The
    * result is materialized once (count action) to drive the
    * observations; callers who want the surviving rows should write
    * `planned.result` themselves and then call `report()`.
    */
  def run(corpus: DataFrame, stages: Seq[Stage]): (DataFrame, DataFrame) = {
    val planned = plan(corpus, stages)
    planned.result.count()
    (planned.result, planned.report())
  }

  /** The standard corpus-preparation chain over a documents table:
    * token-count quality gate → exact dedup (canonical-copy
    * representative wins) → near-dup drop (Jaccard components) →
    * whole-doc decontamination against a probe/benchmark frame.
    */
  def standardStages(idCol: String, textCol: String, probes: DataFrame,
                     minTokens: Int = 10, jaccard: Double = 0.8,
                     maxContamination: Double = 0.2): Seq[Stage] = Seq(
    Stage("quality_gate", df => df.filter(
      size(filter(split(trim(col(textCol)), "\\s+"),
        t => length(t) > 0)) >= minTokens)),
    Stage("exact_dedup", df => {
      val reps = Dedup.exact(df, idCol, textCol)
        .select(col("rep_id").as(idCol))
      df.join(reps, Seq(idCol), "left_semi")
    }),
    Stage("near_dedup", df =>
      Dedup.dropNearDuplicates(df, idCol, textCol, threshold = jaccard)),
    Stage("decontaminate", df =>
      Decontaminate.decontaminate(df, probes, idCol, textCol,
        maxFraction = maxContamination)))
}
