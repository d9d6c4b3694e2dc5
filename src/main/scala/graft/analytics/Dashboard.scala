package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Num

/** Every panel of the reference dashboard as a DataFrame over the feature
  * table (reference: dashboard/app.py §3.2) — a consumer of the reference
  * switches by pointing these at the lake table. Each panel is one
  * declarative query; the dashboard layer only renders. */
object Dashboard {

  /** S4: bounded recent scan feeding the page (LIMIT pushdown ->
    * TakeOrderedAndProject, never a full sort). */
  def recentData(features: DataFrame, limit: Int = 2000): DataFrame =
    features.orderBy(desc("date"), col("symbol")).limit(limit)

  /** F5+F6: sidebar filters — symbol membership + inclusive date range. */
  def filtered(features: DataFrame, symbols: Seq[String],
               from: String, to: String): DataFrame =
    features.filter(col("symbol").isin(symbols: _*) &&
      col("date").between(from, to))

  /** A1-A4 header metrics. */
  def metrics(features: DataFrame): DataFrame =
    Summary.databaseSummary(features)

  /** P5: narrow chart frames (price+MAs / volume / daily change). */
  def priceChart(features: DataFrame): DataFrame =
    features.select("symbol", "date", "close", "ma_5", "ma_20")
  def volumeChart(features: DataFrame): DataFrame =
    features.select("symbol", "date", "volume")
  def changeChart(features: DataFrame): DataFrame =
    features.select("symbol", "date", "daily_change_percent")

  /** O6: stride downsampling to a point budget (deterministic, runs
    * distributed — no driver-side slicing). */
  def downsample(chart: DataFrame, keyCol: String, every: Int): DataFrame =
    chart.filter(pmod(col(keyCol), lit(every)) === 0)

  /** A6 performance table + O4 top movers. */
  def performance(features: DataFrame): DataFrame =
    Performance.performanceTable(features)
  def topMovers(features: DataFrame, k: Int = 5, gainers: Boolean = true): DataFrame =
    Performance.topK(performance(features), "overall_change_percent", k, gainers)

  /** Predictions + signals panels (X7 / W6). */
  def predictions(features: DataFrame): DataFrame =
    Predictions.nextDayForecast(features)
  def signals(features: DataFrame): DataFrame =
    Predictions.tradingSignals(features)

  /** Distribution panel (box-plot feed): per-symbol quartiles of daily
    * change percent (exact percentile, one aggregate). */
  def changeDistribution(features: DataFrame): DataFrame =
    features.groupBy("symbol").agg(
      Num.cround(percentile(col("daily_change_percent"), lit(0.25)), 6).as("q1"),
      Num.cround(percentile(col("daily_change_percent"), lit(0.5)), 6).as("median"),
      Num.cround(percentile(col("daily_change_percent"), lit(0.75)), 6).as("q3"),
      Num.cround(min(col("daily_change_percent")), 6).as("lo"),
      Num.cround(max(col("daily_change_percent")), 6).as("hi"))
}
