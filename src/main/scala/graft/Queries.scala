package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.model.Schemas
import graft.ops.{Cleaning, Derive}
import graft.analytics.{Performance, Predictions, Summary}

/** Named correctness queries over the driver test corpus, one per operator in
  * SURVEY §2. Every query ends in a total deterministic ORDER BY, and every
  * floating-point output is rounded to 6 decimals, so the DuckDB oracle
  * (OracleSql) hash-compares byte-for-byte.
  */
object Queries {

  /** Round the named double columns to `scale` decimals for engine-agnostic
    * hash comparison (window/agg summation order differs across engines by
    * ULPs). */
  def rounded(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), scale)))

  private val ohlcDoubles = Seq("open", "high", "low", "close")

  /** Canonical cleaned stock frame (rid retained as dedup evidence). */
  private def cleanedStock(s: SparkSession, dir: String): DataFrame =
    Cleaning.clean(Sources.stockFromLineitem(s, dir), col("rid"))

  /** stockFromLineitem with deterministic dirt injected so F1-F3 actually
    * remove rows: l_linenumber=7 -> null open (F1), =6 -> high below close
    * (F2), =5 -> negative low (F3). Mirrored in OracleSql.dirtyCte. */
  private def dirtyStock(s: SparkSession, dir: String): DataFrame = {
    val open  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val close = col("l_extendedprice")
    Sources.lineitem(s, dir).select(
      col("l_partkey").cast("string").as("symbol"),
      col("l_shipdate").cast("date").as("date"),
      when(col("l_linenumber") === 7, lit(null)).otherwise(open).as("open"),
      when(col("l_linenumber") === 6, close * 0.5)
        .otherwise(greatest(close, open) * (lit(1.0) + col("l_tax"))).as("high"),
      when(col("l_linenumber") === 5, -close)
        .otherwise(least(close, open) * (lit(1.0) - col("l_tax"))).as("low"),
      close.as("close"),
      floor(col("l_quantity")).cast("long").as("volume"),
      (col("l_orderkey") * lit(10L) + col("l_linenumber")).as("rid"))
  }

  /** Windowed feature columns over the cleaned, deduped stock frame. */
  private def features(s: SparkSession, dir: String): DataFrame =
    Derive.addDerived(cleanedStock(s, dir).drop("rid"))

  // ===== flagship: the reference's full transform stage, end-to-end ========

  def pipelineFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = features(s, dir).withColumn("data_source", lit("graft"))
    val ordered = Cleaning.reorderColumns(feats, Schemas.featureColumns)
    rounded(ordered, ohlcDoubles ++ Seq(
      "daily_change", "daily_change_percent", "price_range",
      "price_range_percent", "volatility_indicator", "ma_5", "ma_20",
      "price_vs_ma5", "price_vs_ma20"))
      .orderBy("symbol", "date")
  }

  // ===== cleaning (P/F/U) ==================================================

  def f1NullDrop(s: SparkSession, dir: String): DataFrame =
    rounded(Cleaning.dropNullCritical(dirtyStock(s, dir))
      .select(col("rid"), col("symbol"), col("open"), col("close")),
      Seq("open", "close")).orderBy("rid")

  def f2OhlcConsistency(s: SparkSession, dir: String): DataFrame =
    rounded(Cleaning.filterOhlcConsistent(Cleaning.dropNullCritical(dirtyStock(s, dir)))
      .select(col("rid"), col("high"), col("low"), col("close")),
      Seq("high", "low", "close")).orderBy("rid")

  def f3NonPositive(s: SparkSession, dir: String): DataFrame =
    rounded(Cleaning.filterPositivePrices(
        Cleaning.filterOhlcConsistent(Cleaning.dropNullCritical(dirtyStock(s, dir))))
      .select(col("rid"), col("open"), col("low")),
      Seq("open", "low")).orderBy("rid")

  def f4DedupKeepLast(s: SparkSession, dir: String): DataFrame =
    rounded(cleanedStock(s, dir)
      .select(col("symbol"), col("date"), col("rid"), col("close")),
      Seq("close")).orderBy("symbol", "date")

  def u1UnionAll(s: SparkSession, dir: String): DataFrame = {
    val o = Sources.orders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    Cleaning.unionAll(Seq(
      o.filter(col("o_orderstatus") === "O"),
      o.filter(col("o_totalprice") > 100000)))
      .orderBy("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  def u2Distinct(s: SparkSession, dir: String): DataFrame =
    Sources.stockFromLineitem(s, dir).select("symbol").distinct().orderBy("symbol")

  // ===== window functions (W1-W5) ==========================================

  private def windowQuery(s: SparkSession, dir: String)(expr: DataFrame => DataFrame): DataFrame =
    expr(cleanedStock(s, dir).drop("rid")).orderBy("symbol", "date")

  private val w = Window.partitionBy("symbol").orderBy("date")

  def w1LagDiff(s: SparkSession, dir: String): DataFrame =
    windowQuery(s, dir)(df => rounded(df.select(col("symbol"), col("date"),
      (col("close") - lag("close", 1).over(w)).as("daily_change")), Seq("daily_change")))

  def w2PctChange(s: SparkSession, dir: String): DataFrame =
    windowQuery(s, dir)(df => rounded(df.select(col("symbol"), col("date"),
      ((col("close") / lag("close", 1).over(w) - 1) * 100).as("daily_change_percent")),
      Seq("daily_change_percent")))

  def w3Ma5(s: SparkSession, dir: String): DataFrame =
    windowQuery(s, dir)(df => rounded(df.select(col("symbol"), col("date"),
      avg("close").over(w.rowsBetween(-4, 0)).as("ma_5")), Seq("ma_5")))

  def w4Ma20(s: SparkSession, dir: String): DataFrame =
    windowQuery(s, dir)(df => rounded(df.select(col("symbol"), col("date"),
      avg("close").over(w.rowsBetween(-19, 0)).as("ma_20")), Seq("ma_20")))

  def w5Volatility(s: SparkSession, dir: String): DataFrame =
    windowQuery(s, dir)(df => rounded(df
      .withColumn("dcp", (col("close") / lag("close", 1).over(w) - 1) * 100)
      .select(col("symbol"), col("date"),
        stddev_samp("dcp").over(w.rowsBetween(-19, 0)).as("volatility_indicator")),
      Seq("volatility_indicator")))

  // ===== aggregates (A1-A5, A7) ============================================

  def a1Count(s: SparkSession, dir: String): DataFrame =
    Sources.lineitem(s, dir).agg(count(lit(1)).as("total_records"))

  def a2CountDistinct(s: SparkSession, dir: String): DataFrame =
    Sources.lineitem(s, dir).agg(countDistinct(col("l_partkey")).as("unique_symbols"))

  def a3MinMaxDate(s: SparkSession, dir: String): DataFrame =
    Sources.lineitem(s, dir).agg(
      min(col("l_shipdate").cast("date")).as("earliest_date"),
      max(col("l_shipdate").cast("date")).as("latest_date"))

  def a4AvgTable(s: SparkSession, dir: String): DataFrame = {
    val f = cleanedStock(s, dir).drop("rid")
      .withColumn("daily_change_percent", (col("close") / lag("close", 1).over(w) - 1) * 100)
    rounded(f.agg(
      avg(col("close")).as("avg_close"),
      avg(col("volume")).as("avg_volume"),
      avg(col("daily_change_percent")).as("avg_daily_change_percent")),
      Seq("avg_close", "avg_volume", "avg_daily_change_percent"))
  }

  def a5Quantiles(s: SparkSession, dir: String): DataFrame =
    rounded(Derive.volumeQuartiles(cleanedStock(s, dir)),
      Seq("vol_q1", "vol_q2", "vol_q3")).orderBy("symbol")

  def a7Stddev(s: SparkSession, dir: String): DataFrame = {
    val f = cleanedStock(s, dir).drop("rid")
      .withColumn("dcp", (col("close") / lag("close", 1).over(w) - 1) * 100)
    rounded(f.groupBy("symbol").agg(stddev_samp(col("dcp")).as("stddev_dcp")),
      Seq("stddev_dcp")).orderBy("symbol")
  }

  // ===== registry ==========================================================

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_features" -> (pipelineFeatures _),
    "f1_null_drop" -> (f1NullDrop _),
    "f2_ohlc_consistency" -> (f2OhlcConsistency _),
    "f3_non_positive" -> (f3NonPositive _),
    "f4_dedup_keep_last" -> (f4DedupKeepLast _),
    "u1_union_all" -> (u1UnionAll _),
    "u2_distinct" -> (u2Distinct _),
    "w1_lag_diff" -> (w1LagDiff _),
    "w2_pct_change" -> (w2PctChange _),
    "w3_ma5" -> (w3Ma5 _),
    "w4_ma20" -> (w4Ma20 _),
    "w5_volatility" -> (w5Volatility _),
    "a1_count" -> (a1Count _),
    "a2_count_distinct" -> (a2CountDistinct _),
    "a3_minmax_date" -> (a3MinMaxDate _),
    "a4_avg_table" -> (a4AvgTable _),
    "a5_quantiles" -> (a5Quantiles _),
    "a7_stddev" -> (a7Stddev _)
  )
}
