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
}
