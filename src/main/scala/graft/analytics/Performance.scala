package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-symbol performance table (reference: dashboard/app.py:641-680, A6) and
  * top-k helpers (O4). One hash aggregate on symbol; `max_by`/`min_by` give
  * deterministic latest/first rows without a second window pass
  * (SURVEY §2.4 A6 note). */
object Performance {

  /** A6: per-symbol latest/first/min/max/avg close, avg daily change %, total
    * volume, and overall % change (latest vs first). (symbol, date) is unique
    * post-dedup so max_by/min_by are deterministic. */
  def performanceTable(features: DataFrame): DataFrame =
    features.groupBy("symbol").agg(
      max_by(col("close"), col("date")).as("latest_close"),
      min_by(col("close"), col("date")).as("first_close"),
      min(col("close")).as("min_close"),
      max(col("close")).as("max_close"),
      avg(col("close")).as("avg_close"),
      avg(col("daily_change_percent")).as("avg_daily_change_percent"),
      sum(col("volume")).as("total_volume"))
      .withColumn("overall_change_percent",
        (col("latest_close") / col("first_close") - 1) * 100)

  /** O4: top-k by an arbitrary measure (pandas nlargest/nsmallest).
    * Catalyst plans TakeOrderedAndProject — a per-partition top-k plus a
    * k-row merge on the driver, never a full sort. */
  def topK(df: DataFrame, measure: String, k: Int, largest: Boolean = true,
           tiebreak: String = "symbol"): DataFrame = {
    val ord = if (largest) desc(measure) else asc(measure)
    df.orderBy(ord, col(tiebreak)).limit(k)
  }
}
