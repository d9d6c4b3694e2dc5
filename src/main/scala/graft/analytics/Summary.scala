package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Database-summary aggregates (reference: src/load.py:291-381, A1-A4) and
  * frequency/describe helpers (A10). All are single partial+final hash
  * aggregates — map-side combine means the shuffle carries one row per
  * partition, so these stay cheap at any scale. */
object Summary {

  /** A1-A4 in one pass: total records, distinct symbols, date range, table
    * averages (AVG ignores nulls, matching the reference's WHERE close IS NOT
    * NULL guard). COUNT(DISTINCT) is exact — the reference is exact and the
    * oracle demands it; swap to approx_count_distinct only for monitoring. */
  def databaseSummary(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col("symbol")).as("unique_symbols"),
      min(col("date")).as("earliest_date"),
      max(col("date")).as("latest_date"),
      avg(col("close")).as("avg_close"),
      avg(col("volume")).as("avg_volume"),
      avg(col("daily_change_percent")).as("avg_daily_change_percent"))

  /** Monitoring-path twin of databaseSummary for 100 TB scale: sketch-based
    * distinct count (HLL++) and approximate percentiles — single pass,
    * constant memory per partition, mergeable sketches instead of exact
    * shuffled state. NOT oracle-compared (approximate by design); the exact
    * versions above remain the correctness path. */
  def approxSummary(df: DataFrame, relativeError: Double = 0.01): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      approx_count_distinct(col("symbol"), relativeError).as("approx_symbols"),
      percentile_approx(col("close"), lit(0.5), lit(10000)).as("approx_median_close"),
      percentile_approx(col("volume"), array(lit(0.25), lit(0.75)), lit(10000))
        .as("approx_volume_iqr"))

  /** A10: category frequency table (pandas value_counts). */
  def valueCounts(df: DataFrame, column: String): DataFrame =
    df.groupBy(column).count().orderBy(desc("count"), col(column))

  /** A9: count and share of positive days (reference: src/transform.py:425-426). */
  def upDayStats(df: DataFrame): DataFrame =
    df.agg(
      sum(when(col("is_positive_day"), 1L).otherwise(0L)).as("positive_days"),
      avg(col("is_positive_day").cast("int")).as("positive_day_ratio"))
}
