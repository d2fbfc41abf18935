package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL RANK — dense 1..N row numbering in a total
  * order WITHOUT the single-task `ROW_NUMBER() OVER (ORDER BY ...)`
  * window (PlanAudit flags that shape: one task absorbs every row).
  * Same two-pass discipline as [[PrefixSum]]:
  *
  *  1. range-partition on the order column and PIN the sampled
  *     layout (eager localCheckpoint — the counts pass and the rank
  *     pass must see the same partitioning);
  *  2. per-partition row counts (one row per partition) to the
  *     driver, cumulated into per-partition starting offsets;
  *  3. partition-LOCAL row_number (parallel, bounded state) plus the
  *     broadcast offset.
  *
  * Requires rows unique on `orderCol` (a total order — equal keys
  * would make ranks partition-dependent); range partitioning never
  * splits equal keys, so per-partition distinctness certifies it,
  * checked on the same counts pass.
  */
object Ranking {

  /** Append `outCol` = 1-based dense global rank in `orderCol`
    * order.
    */
  def globalRank(df: DataFrame, orderCol: String, outCol: String,
                 partitions: Int = 0): DataFrame =
    globalRank(df, Seq(orderCol), outCol, partitions)

  /** Composite-key form: global rank in the lexicographic order of
    * `orderCols`. Rows must be unique on the COMPOSITE key (append a
    * unique id as the last column to break ties); range partitioning
    * never splits equal composites, so per-partition distinctness
    * certifies it on the same counts pass.
    */
  def globalRank(df: DataFrame, orderCols: Seq[String], outCol: String,
                 partitions: Int): DataFrame =
    globalRank(df, orderCols, outCol, partitions, 250000L)

  /** SIZE-ROUTED form (r17 — the [[RankCorr.cumFromCountsWith]] /
    * [[Components.connectedComponents]] convention): the input is
    * pinned once with its row count riding the checkpoint as an
    * Observation metric; at or under `maxLocalRows` with ALL order
    * columns integral (longs compare identically on the driver and
    * in Spark — strings do NOT outside the BMP, the Components
    * collation rule), ranking is one driver sort over the collected
    * rows, with the same uniqueness refusal. Above the cap, or with
    * any non-integral key, the sampled-range path runs unchanged.
    */
  def globalRank(df: DataFrame, orderCols: Seq[String], outCol: String,
                 partitions: Int, maxLocalRows: Long): DataFrame = {
    val spark = df.sparkSession
    // r18 probe gate (the r17 pin ran unconditionally — measured +25%
    // on q93's above-cap input): the local route is ruled IN/OUT from
    // the schema and the caller's arguments BEFORE any
    // materialization — all order columns integral (longs compare
    // identically on the driver and in Spark — strings do NOT outside
    // the BMP, the Components collation rule), no explicit partitions
    // (partitions > 0 is a requested distributed layout and now takes
    // precedence, the PrefixSum convention), maxLocalRows >= 0. When
    // ruled out, the old unpinned distributed path runs — no probe
    // cost at all. When the input is ALREADY a materialized scan (a
    // caller's checkpoint, e.g. q93's perValue), a plain count()
    // probes the route without re-serializing it ([[SizeRoute]]).
    val integralKeys = orderCols.forall(c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      })
    val base =
      if (!integralKeys || partitions > 0 || maxLocalRows < 0) df
      else if (SizeRoute.isMaterializedScan(df)) {
        if (df.count() <= maxLocalRows)
          return rankLocal(df, orderCols, outCol)
        df
      } else {
        val pinObs = org.apache.spark.sql.Observation()
        val pinned = df.observe(pinObs, count(lit(1)).as("rows"))
          .localCheckpoint(true)
        if (pinObs.get("rows").asInstanceOf[Long] <= maxLocalRows)
          return rankLocal(pinned, orderCols, outCol)
        pinned
      }
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = base.repartitionByRange(n, orderCols.map(col): _*)
      .localCheckpoint(true)
    val withPid = ranged.withColumn("__pid",
      spark_partition_id().cast("long"))
    val countRows = withPid.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"),
        count_distinct(col(orderCols.head), orderCols.tail.map(col): _*)
          .as("__nd"))
      .collect()
    require(countRows.forall(r => r.getLong(1) == r.getLong(2)),
      s"Ranking: rows must be unique on '${orderCols.mkString(",")}' — a " +
        "global rank over duplicate keys is partition-order-dependent")
    val counts = countRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).map { p =>
      p.toLong -> (0L until p.toLong).map(counts.getOrElse(_, 0L)).sum
    }
    val offDf = broadcast(spark.createDataFrame(offsets)
      .toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
    withPid.join(offDf, Seq("__pid"))
      .withColumn(outCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** Driver-local route of [[globalRank]]: one sort over the
    * collected rows on the integral key tuple, the same uniqueness
    * refusal (null keys refuse too — the distributed guard's
    * behavior), output returned RDD-backed (never a row-scale
    * LocalRelation — the [[RankCorr]] cumLocal lesson).
    */
  private def rankLocal(pinned: DataFrame, orderCols: Seq[String],
                        outCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = pinned.sparkSession
    val schema = pinned.schema
    val idx = orderCols.map(schema.fieldIndex)
    val rows = pinned.collect()
    // NULL order keys refuse with the distributed path's message and
    // semantics (r18 — ADVICE parity fix): there, count_distinct
    // skips any-null key tuples, so a single null key trips the
    // __n != __nd uniqueness refusal regardless of actual duplicates;
    // accepting them here (nulls-first sorted) would make the SAME
    // input succeed under the cap and refuse above it.
    require(rows.forall(r => idx.forall(i => !r.isNullAt(i))),
      s"Ranking: rows must be unique on '${orderCols.mkString(",")}' — a " +
        "global rank over duplicate keys is partition-order-dependent")
    def key(r: org.apache.spark.sql.Row): Seq[Long] =
      idx.map(r.getAs[Number](_).longValue)
    implicit val ord: Ordering[Seq[Long]] = {
      import scala.math.Ordering.Implicits.seqOrdering
      seqOrdering(Ordering.Long)
    }
    val sorted = rows.sortBy(key)
    require(sorted.length < 2 || sorted.iterator.zip(
        sorted.iterator.drop(1)).forall { case (a, b) => key(a) != key(b) },
      s"Ranking: rows must be unique on '${orderCols.mkString(",")}' — a " +
        "global rank over duplicate keys is partition-order-dependent")
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length)
    var i = 0L
    sorted.foreach { r =>
      i += 1
      out.add(org.apache.spark.sql.Row(
        (r.toSeq :+ java.lang.Long.valueOf(i)): _*))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.asScala.toSeq,
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          1 + out.size / 20000))),
      StructType(schema.fields :+ StructField(outCol, LongType)))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke SIGIR '09) of several
    * rankings of the same id space: score(id) = Σ_r 1/(k + rank_r(id))
    * — the standard zero-tuning combiner for heterogeneous retrievers
    * (BM25 + ANN + recency…). The reciprocal is FIXED-POINT floored
    * to an exact integer, 10¹² div (k + rank) (the q113 discipline),
    * so the sum is order-free bigint algebra — no float-summation
    * drift across partitionings or engines. Ids absent from a ranking
    * contribute nothing (the standard convention).
    *
    * Shape: one union + one hash aggregate — rankings are
    * (id, rank) tables, nothing else moves.
    *
    * @param rankings (id, rank) frames; ranks 1-based
    * @return (idCol, rrf_score) — exact bigint, callers order/cut
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k >= 0, s"rrfFuse: k must be >= 0, got $k")
    val parts = rankings.map(_.select(col(idCol),
      expr(s"1000000000000 DIV ($k + CAST($rankCol AS BIGINT))")
        .as("__rr")))
    parts.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__rr")).cast("bigint").as("rrf_score"))
  }
}
