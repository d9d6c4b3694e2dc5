package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named query per implemented operator from SURVEY §2
  * (definitions in [[Queries]]); `oracleSql` holds the DuckDB-equivalent SQL
  * with identical column aliases, rounding, and ordering ([[OracleSql]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's full transform stage (clean + dedup + all 18
    * derived feature columns) over the canonical stock mapping. */
  def entry(spark: SparkSession): DataFrame =
    Queries.pipelineFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.all
}
