package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record construction (survivorship) — the master-data step
  * after entity resolution / CDC merge: collapse an entity's update
  * history into ONE record where each FIELD independently keeps its
  * latest non-null value. Whole-row latest-wins (CdcMerge) throws
  * away older rows' still-current fields when updates are PARTIAL;
  * survivorship merges them.
  *
  * Reference shape: the CDC client's merged apply is whole-row
  * (reference TableReader run loop + JdbcOutputWriter merge); the
  * per-field rule is the MDM generalization a consumer builds on top.
  *
  * Shape at 100 TB: ONE hash aggregation on the entity key — per
  * field `max(when(field not null, struct(seq…, field)))`, a
  * lexicographic arg-max that composes in the partial aggregate, so
  * the shuffle carries one candidate struct per (partition, key,
  * field), never the history. No window, no self-join, no second
  * scan. Deterministic: callers pass `seqCols` that totally order an
  * entity's updates (the CDC seqno convention — append a unique id
  * last if the natural ordering can tie).
  */
object Survivorship {

  /** @param seqCols update-recency ordering, most significant first;
    *        must not tie within a key for rows that could disagree
    * @param fields payload columns merged per-field
    * @return one row per key: (keyCol, fields…, n_updates,
    *         last_seen = max of the first seq column)
    */
  def goldenRecord(df: DataFrame, keyCol: String, seqCols: Seq[String],
                   fields: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "goldenRecord: need at least one seq column")
    require(fields.nonEmpty, "goldenRecord: need at least one field")
    require(!fields.contains(keyCol) && !seqCols.contains(keyCol),
      "goldenRecord: key column cannot also be a field or seq column")
    val picks = fields.map { f =>
      max(when(col(f).isNotNull,
        struct(seqCols.map(col) :+ col(f).as("__v"): _*)))
        .getField("__v").as(f)
    }
    val aggs = picks ++ Seq(
      count(lit(1)).cast("bigint").as("n_updates"),
      max(col(seqCols.head)).as("last_seen"))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
