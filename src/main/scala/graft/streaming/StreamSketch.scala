package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Cms

/** Incremental mergeable-sketch maintenance over a stream.
  *
  * The point of mergeable sketches (q45 HLL, q48 CMS) is that
  * incremental maintenance is FREE: each micro-batch contributes one
  * model-sized per-group sketch, and the running rollup is a sketch
  * UNION across contributions — no raw-row state, no rescans, state
  * size O(groups × sketch bytes) forever. This wires that into the
  * [[BatchDirs]] protocol the other streaming operators use:
  *
  *   - batch N writes its per-group sketches to `batch_N`
  *     (replay overwrites the same dir → effectively-once);
  *   - the live rollup unions sketches across current dirs;
  *   - every K batches [[BatchDirs.consolidate]] folds dirs, with
  *     the MERGE CALLBACK = per-group sketch union — consolidation
  *     is semantically lossless because union is associative and
  *     commutative, so the tiered fold order cannot matter.
  *
  * The sketch family is pluggable: pass the build/union aggregate
  * pair (defaults: count-min via [[graft.plans.Cms]]; Spark's
  * `hll_sketch_agg`/`hll_union_agg` columns work the same way).
  */
object StreamSketch {

  val SketchCol = "__sketch"

  /** `foreachBatch` body: persist this batch's per-group sketches. */
  def applyBatch(spark: SparkSession, batch: DataFrame, root: String,
                 batchId: Long, keyCols: Seq[String], value: Column,
                 build: Column => Column = Cms.sketch(_),
                 union: Column => Column = Cms.union(_),
                 consolidateEvery: Int = 8): Unit = {
    val perKey = batch.groupBy(keyCols.map(col): _*)
      .agg(build(value).as(SketchCol))
    perKey.write.mode("overwrite").parquet(s"$root/batch_$batchId")
    if (consolidateEvery > 0 && batchId > 0 &&
        batchId % consolidateEvery == 0) {
      BatchDirs.consolidate(spark, root, batchId,
        merge = df => df.groupBy(keyCols.map(col): _*)
          .agg(union(col(SketchCol)).as(SketchCol)))
    }
  }

  /** The current rollup: one unioned sketch per key. */
  def state(spark: SparkSession, root: String, keyCols: Seq[String],
            union: Column => Column = Cms.union(_)): DataFrame =
    BatchDirs.read(spark, root)
      .groupBy(keyCols.map(col): _*)
      .agg(union(col(SketchCol)).as(SketchCol))

  /** Point estimates from the rollup for a small broadcast item list. */
  def estimates(spark: SparkSession, root: String, keyCols: Seq[String],
                items: DataFrame, itemCol: String,
                union: Column => Column = Cms.union(_),
                estimate: (Column, Column) => Column =
                  Cms.estimate(_, _)): DataFrame =
    state(spark, root, keyCols, union)
      .crossJoin(broadcast(items))
      .select(keyCols.map(col) ++ Seq(col(itemCol),
        estimate(col(SketchCol), col(itemCol)).as("est")): _*)
}
