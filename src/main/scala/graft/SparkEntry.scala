package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Advanced2, Advanced3, Advanced4, Advanced5, Advanced6, Advanced7, Advanced8, Advanced9, Cdc, Eval, Relational, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cdc.queries ++ TextQueries.queries ++
      Advanced.queries ++ Advanced2.queries ++ Advanced3.queries ++
      Advanced4.queries ++ Advanced5.queries ++ Advanced6.queries ++
      Advanced7.queries ++ Advanced8.queries ++ Advanced9.queries ++ Eval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check; see SURVEY.md §6). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Cdc.oracles ++ TextQueries.oracles ++
      Advanced.oracles ++ Advanced2.oracles ++ Advanced3.oracles ++
      Advanced4.oracles ++ Advanced5.oracles ++ Advanced6.oracles ++
      Advanced7.oracles ++ Advanced8.oracles ++ Advanced9.oracles ++ Eval.oracleSql
}
