package graft.cdc

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Derive a CDC feed FROM two table snapshots — the inverse of
  * `CdcMerge.applyOperations`: given versions v1 and v2 of a table,
  * emit insert/update/delete rows with the reference's op codes so
  * any CDC consumer (including graft's own merge) can replay the
  * transition.
  *
  * One full-outer join on the key; payload comparison via a hash of
  * the non-key columns, so wide rows compare cheaply.
  */
object SnapshotDiff {

  /** @return rows of v2 (for ins/upd) or v1-keys (for del) with
    *         `gwcbi___operation` set: 2=insert, 4=update, 1=delete.
    */
  def diff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payloadCols = v2.columns.filterNot(keyCols.contains).toIndexedSeq
    require(payloadCols.nonEmpty, "diff requires at least one non-key column")
    def hashed(df: DataFrame, side: String) = {
      val pay = df.columns.filterNot(keyCols.contains).toIndexedSeq
      df.select(
        keyCols.map(col) ++
          pay.map(c => col(c).as(s"${side}_$c")) :+
          xxhash64(pay.map(col): _*).as(s"${side}_h"): _*)
    }
    val l = hashed(v1, "l")
    val r = hashed(v2, "r")
    val joined = l.join(r, keyCols, "full_outer")
    val op = when(col("l_h").isNull, lit(2)) // only in v2 → insert
      .when(col("r_h").isNull, lit(1)) // only in v1 → delete
      .when(col("l_h") =!= col("r_h"), lit(4)) // changed → update
      .otherwise(lit(0)) // unchanged → dropped below
    joined
      .withColumn(CdcColumns.OperationCol, op)
      .filter(col(CdcColumns.OperationCol) =!= 0)
      .select(
        keyCols.map(col) ++
          payloadCols.map(c =>
            // deletes carry the v1 payload (v2 side is null)
            coalesce(col(s"r_$c"), col(s"l_$c")).as(c)) :+
          col(CdcColumns.OperationCol): _*)
  }

  /** COLUMN-level churn between two snapshots — which columns drive
    * the updates (schema-evolution planning, hot-column detection,
    * "is this feed mostly price ticks?"). One full-outer join on the
    * key, every per-column change indicator computed in the same
    * projection, one aggregation, then a stack to (column, …) rows —
    * the column count is schema-sized, so the output is model-sized
    * regardless of data volume. Null-safe comparison (`<=>`): a
    * null→value transition counts as a change.
    *
    * @return one row per non-key column: (column, n_changed,
    *         n_overlap, n_inserted, n_deleted).
    */
  def columnChurn(v1: DataFrame, v2: DataFrame, keyCols: Seq[String])
  : DataFrame = {
    val payloadCols = v2.columns.filterNot(keyCols.contains).toIndexedSeq
    require(payloadCols.nonEmpty, "columnChurn requires a non-key column")
    // Raw column names are backtick-quoted (with `` escaping) wherever
    // they re-enter the column parser, and the unpivot is a typed
    // explode over structs rather than an interpolated stack()
    // selectExpr — a name containing quotes, dots, or backticks cannot
    // break an expression at runtime.
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    def side(df: DataFrame, s: String) = df.select(
      keyCols.map(q) ++
        df.columns.filterNot(keyCols.contains).toIndexedSeq
          .map(c => q(c).as(s"${s}_$c")) :+
        lit(1L).as(s"${s}_present"): _*)
    val joined = side(v1, "l").join(side(v2, "r"), keyCols, "full_outer")
    val overlap = col("l_present").isNotNull && col("r_present").isNotNull
    val aggCols =
      sum(when(overlap, 1L).otherwise(0L)).cast("bigint").as("n_overlap") +:
      sum(when(col("l_present").isNull, 1L).otherwise(0L)).cast("bigint")
        .as("n_inserted") +:
      sum(when(col("r_present").isNull, 1L).otherwise(0L)).cast("bigint")
        .as("n_deleted") +:
      payloadCols.map(c =>
        sum(when(overlap && !(q(s"l_$c") <=> q(s"r_$c")), 1L)
          .otherwise(0L)).cast("bigint").as(s"chg_$c"))
    val agg = joined.agg(aggCols.head, aggCols.tail: _*)
    val churnRows = array(payloadCols.map(c =>
      struct(lit(c).as("col_name"), q(s"chg_$c").as("n_changed"))): _*)
    agg.select(explode(churnRows).as("p"),
        col("n_overlap"), col("n_inserted"), col("n_deleted"))
      .select(col("p.col_name").as("col_name"),
        col("p.n_changed").as("n_changed"),
        col("n_overlap"), col("n_inserted"), col("n_deleted"))
  }
}
