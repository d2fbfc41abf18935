package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables — the co-located-join tool
  * (SURVEY.md §5): two tables bucketed (and sorted) on the same join
  * key with the same bucket count join WITHOUT a shuffle, because
  * both sides already satisfy the join's required distribution.
  * At 100 TB this converts every recurring fact-fact join on the
  * bucket key from a full exchange into a local zip of bucket files.
  */
object BucketedTables {

  /** Write `df` as a managed bucketed table. `sortBuckets` also sorts
    * within each bucket file, enabling sort-merge joins with neither
    * exchange NOR sort.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int, sortBuckets: Boolean = true,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortBuckets) w.sortBy(bucketCol) else w).saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on the bucket key. The returned
    * plan has no Exchange on either side (spec-asserted).
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
                    leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
