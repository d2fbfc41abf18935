package graft.cdc

import org.apache.spark.sql.DataFrame

/** Schema evolution across CDC batches.
  *
  * The reference tracks schema "fingerprints" per table and ALTERs
  * the target when a new fingerprint adds columns (cda-client
  * JdbcOutputWriter.scala:209-232). In Spark the equivalent is a
  * name-based union where missing columns become nulls — resolved at
  * plan time, so it costs nothing at execution.
  */
object SchemaEvolution {

  /** Union batches with possibly different schemas; columns missing
    * in older batches are null-filled.
    */
  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "unionEvolved requires at least one batch")
    batches.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Columns added by `next` relative to `prev` — the set the
    * reference would ALTER TABLE ADD.
    */
  def addedColumns(prev: DataFrame, next: DataFrame): Seq[String] = {
    val prevCols = prev.columns.map(_.toLowerCase).toSet
    next.columns.filterNot(c => prevCols.contains(c.toLowerCase)).toIndexedSeq
  }
}
