package graft

/** DuckDB oracle SQL, one entry per Queries key. Each statement is the ANSI
  * equivalent of the Spark query, with identical column aliases, identical
  * ROUND(.., 6) on floating-point outputs, and the same total ORDER BY.
  *
  * Dialect notes (SURVEY §7.4): pandas/Spark weekday() 0=Monday ->
  * DuckDB isodow()-1; Spark weekofyear() ISO -> DuckDB weekofyear();
  * Spark exact percentile -> DuckDB quantile_cont; Spark stddev_samp ->
  * DuckDB stddev_samp; date-part results cast to INTEGER to match Spark's
  * 32-bit ints; SUMs of BIGINT cast back to BIGINT (DuckDB widens to
  * HUGEINT).
  */
object OracleSql {

  /** lineitem -> canonical OHLCV (mirror of Sources.stockFromLineitem). */
  val stockCte: String =
    """stock AS (
      |  SELECT CAST(l_partkey AS VARCHAR) AS symbol,
      |         CAST(l_shipdate AS DATE) AS "date",
      |         l_extendedprice * (1 - l_discount) AS open,
      |         GREATEST(l_extendedprice, l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS high,
      |         LEAST(l_extendedprice, l_extendedprice * (1 - l_discount)) * (1 - l_tax) AS low,
      |         l_extendedprice AS close,
      |         CAST(FLOOR(l_quantity) AS BIGINT) AS volume,
      |         l_orderkey * 10 + l_linenumber AS rid
      |  FROM lineitem)""".stripMargin

  /** lineitem -> OHLCV with injected dirt (mirror of Queries.dirtyStock). */
  val dirtyCte: String =
    """dirty AS (
      |  SELECT CAST(l_partkey AS VARCHAR) AS symbol,
      |         CAST(l_shipdate AS DATE) AS "date",
      |         CASE WHEN l_linenumber = 7 THEN NULL
      |              ELSE l_extendedprice * (1 - l_discount) END AS open,
      |         CASE WHEN l_linenumber = 6 THEN l_extendedprice * 0.5
      |              ELSE GREATEST(l_extendedprice, l_extendedprice * (1 - l_discount)) * (1 + l_tax) END AS high,
      |         CASE WHEN l_linenumber = 5 THEN -l_extendedprice
      |              ELSE LEAST(l_extendedprice, l_extendedprice * (1 - l_discount)) * (1 - l_tax) END AS low,
      |         l_extendedprice AS close,
      |         CAST(FLOOR(l_quantity) AS BIGINT) AS volume,
      |         l_orderkey * 10 + l_linenumber AS rid
      |  FROM lineitem)""".stripMargin

  private def notNullPred(rel: String): String =
    s"""$rel.open IS NOT NULL AND $rel.high IS NOT NULL AND $rel.low IS NOT NULL
       |    AND $rel.close IS NOT NULL AND $rel.volume IS NOT NULL
       |    AND $rel."date" IS NOT NULL AND $rel.symbol IS NOT NULL""".stripMargin

  private val consistentPred: String =
    "NOT (high < low OR high < open OR high < close OR low > open OR low > close)"

  private val positivePred: String =
    "open > 0 AND high > 0 AND low > 0 AND close > 0 AND volume >= 0"

  /** F1+F2+F3 over stock. */
  val cleanCte: String =
    s"""clean AS (
       |  SELECT * FROM stock s
       |  WHERE ${notNullPred("s")}
       |    AND $consistentPred AND $positivePred)""".stripMargin

  /** F4: keep-last dedup on (symbol, date), tiebreak = greatest rid. */
  val dedupCte: String =
    """dedup AS (
      |  SELECT symbol, "date", open, high, low, close, volume, rid FROM (
      |    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY symbol, "date" ORDER BY rid DESC) AS __rn
      |    FROM clean c)
      |  WHERE __rn = 1)""".stripMargin

  /** First feature layer: lag/pct/ranges/calendar/mas (mirror of Derive). */
  val feat1Cte: String =
    """feat1 AS (
      |  SELECT symbol, "date", open, high, low, close, volume,
      |    close - LAG(close) OVER w AS daily_change,
      |    (close / LAG(close) OVER w - 1) * 100 AS daily_change_percent,
      |    high - low AS price_range,
      |    (high - low) / close * 100 AS price_range_percent,
      |    CAST(year("date") AS INTEGER) AS year,
      |    CAST(month("date") AS INTEGER) AS month,
      |    CAST(quarter("date") AS INTEGER) AS quarter,
      |    CAST(isodow("date") - 1 AS INTEGER) AS day_of_week,
      |    CAST(weekofyear("date") AS INTEGER) AS week_of_year,
      |    AVG(close) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma_5,
      |    AVG(close) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ma_20
      |  FROM dedup
      |  WINDOW w AS (PARTITION BY symbol ORDER BY "date"))""".stripMargin

  /** Second feature layer: flags, ma-relative, volatility. */
  val feat2Cte: String =
    """feat2 AS (
      |  SELECT *,
      |    COALESCE(daily_change > 0, FALSE) AS is_positive_day,
      |    COALESCE(daily_change < 0, FALSE) AS is_negative_day,
      |    (close - ma_5) / ma_5 * 100 AS price_vs_ma5,
      |    (close - ma_20) / ma_20 * 100 AS price_vs_ma20,
      |    STDDEV_SAMP(daily_change_percent) OVER
      |      (PARTITION BY symbol ORDER BY "date" ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
      |      AS volatility_indicator
      |  FROM feat1)""".stripMargin

  /** Per-symbol volume quartiles (exact, linear interpolation). */
  val vqCte: String =
    """vq AS (
      |  SELECT symbol,
      |         quantile_cont(volume, 0.25) AS vol_q1,
      |         quantile_cont(volume, 0.50) AS vol_q2,
      |         quantile_cont(volume, 0.75) AS vol_q3
      |  FROM dedup GROUP BY symbol)""".stripMargin

  val volatilityCategoryCase: String =
    """CASE WHEN volatility_indicator IS NULL THEN 'Unknown'
      |     WHEN volatility_indicator < 1.0 THEN 'Very Low'
      |     WHEN volatility_indicator < 2.0 THEN 'Low'
      |     WHEN volatility_indicator < 3.5 THEN 'Medium'
      |     WHEN volatility_indicator < 5.0 THEN 'High'
      |     ELSE 'Very High' END""".stripMargin

  val volumeCategoryCase: String =
    """CASE WHEN f.volume IS NULL THEN 'Unknown'
      |     WHEN f.volume <= vq.vol_q1 THEN 'Low'
      |     WHEN f.volume <= vq.vol_q2 THEN 'Medium'
      |     WHEN f.volume <= vq.vol_q3 THEN 'High'
      |     ELSE 'Very High' END""".stripMargin

  def withCtes(ctes: String*)(body: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + body

  private val pipelineCtes =
    Seq(stockCte, cleanCte, dedupCte, feat1Cte, feat2Cte, vqCte)

  val pipelineFeatures: String = withCtes(pipelineCtes: _*)(
    s"""SELECT f.symbol, f."date",
       |  ROUND(f.open, 6) AS open, ROUND(f.high, 6) AS high,
       |  ROUND(f.low, 6) AS low, ROUND(f.close, 6) AS close, f.volume,
       |  ROUND(f.daily_change, 6) AS daily_change,
       |  ROUND(f.daily_change_percent, 6) AS daily_change_percent,
       |  ROUND(f.price_range, 6) AS price_range,
       |  ROUND(f.price_range_percent, 6) AS price_range_percent,
       |  f.year, f.month, f.quarter, f.day_of_week, f.week_of_year,
       |  f.is_positive_day, f.is_negative_day,
       |  $volumeCategoryCase AS volume_category,
       |  ROUND(f.volatility_indicator, 6) AS volatility_indicator,
       |  $volatilityCategoryCase AS volatility_category,
       |  ROUND(f.ma_5, 6) AS ma_5, ROUND(f.ma_20, 6) AS ma_20,
       |  ROUND(f.price_vs_ma5, 6) AS price_vs_ma5,
       |  ROUND(f.price_vs_ma20, 6) AS price_vs_ma20,
       |  'graft' AS data_source
       |FROM feat2 f JOIN vq ON f.symbol = vq.symbol
       |ORDER BY f.symbol, f."date"""".stripMargin)

  val all: Map[String, String] = Map(
    "pipeline_features" -> pipelineFeatures,

    "f1_null_drop" -> withCtes(dirtyCte)(
      s"""SELECT rid, symbol, ROUND(open, 6) AS open, ROUND(close, 6) AS close
         |FROM dirty d
         |WHERE ${notNullPred("d")}
         |ORDER BY rid""".stripMargin),

    "f2_ohlc_consistency" -> withCtes(dirtyCte)(
      s"""SELECT rid, ROUND(high, 6) AS high, ROUND(low, 6) AS low, ROUND(close, 6) AS close
         |FROM dirty d
         |WHERE ${notNullPred("d")} AND $consistentPred
         |ORDER BY rid""".stripMargin),

    "f3_non_positive" -> withCtes(dirtyCte)(
      s"""SELECT rid, ROUND(open, 6) AS open, ROUND(low, 6) AS low
         |FROM dirty d
         |WHERE ${notNullPred("d")} AND $consistentPred AND $positivePred
         |ORDER BY rid""".stripMargin),

    "f4_dedup_keep_last" -> withCtes(stockCte, cleanCte, dedupCte)(
      """SELECT symbol, "date", rid, ROUND(close, 6) AS close
        |FROM dedup
        |ORDER BY symbol, "date"""".stripMargin),

    "u1_union_all" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 100000
        |ORDER BY o_orderkey, o_orderstatus, o_totalprice""".stripMargin,

    "u2_distinct" -> withCtes(stockCte)(
      "SELECT DISTINCT symbol FROM stock ORDER BY symbol"),

    "w1_lag_diff" -> withCtes(stockCte, cleanCte, dedupCte)(
      """SELECT symbol, "date",
        |  ROUND(close - LAG(close) OVER w, 6) AS daily_change
        |FROM dedup WINDOW w AS (PARTITION BY symbol ORDER BY "date")
        |ORDER BY symbol, "date"""".stripMargin),

    "w2_pct_change" -> withCtes(stockCte, cleanCte, dedupCte)(
      """SELECT symbol, "date",
        |  ROUND((close / LAG(close) OVER w - 1) * 100, 6) AS daily_change_percent
        |FROM dedup WINDOW w AS (PARTITION BY symbol ORDER BY "date")
        |ORDER BY symbol, "date"""".stripMargin),

    "w3_ma5" -> withCtes(stockCte, cleanCte, dedupCte)(
      """SELECT symbol, "date",
        |  ROUND(AVG(close) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma_5
        |FROM dedup WINDOW w AS (PARTITION BY symbol ORDER BY "date")
        |ORDER BY symbol, "date"""".stripMargin),

    "w4_ma20" -> withCtes(stockCte, cleanCte, dedupCte)(
      """SELECT symbol, "date",
        |  ROUND(AVG(close) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS ma_20
        |FROM dedup WINDOW w AS (PARTITION BY symbol ORDER BY "date")
        |ORDER BY symbol, "date"""".stripMargin),

    "w5_volatility" -> withCtes(stockCte, cleanCte, dedupCte,
      """dcp AS (
        |  SELECT symbol, "date",
        |    (close / LAG(close) OVER (PARTITION BY symbol ORDER BY "date") - 1) * 100 AS dcp
        |  FROM dedup)""".stripMargin)(
      """SELECT symbol, "date",
        |  ROUND(STDDEV_SAMP(dcp) OVER
        |    (PARTITION BY symbol ORDER BY "date" ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6)
        |    AS volatility_indicator
        |FROM dcp
        |ORDER BY symbol, "date"""".stripMargin),

    "a1_count" -> "SELECT COUNT(*) AS total_records FROM lineitem",

    "a2_count_distinct" ->
      "SELECT COUNT(DISTINCT l_partkey) AS unique_symbols FROM lineitem",

    "a3_minmax_date" ->
      """SELECT MIN(CAST(l_shipdate AS DATE)) AS earliest_date,
        |       MAX(CAST(l_shipdate AS DATE)) AS latest_date
        |FROM lineitem""".stripMargin,

    "a4_avg_table" -> withCtes(stockCte, cleanCte, dedupCte,
      """dcp AS (
        |  SELECT *,
        |    (close / LAG(close) OVER (PARTITION BY symbol ORDER BY "date") - 1) * 100
        |      AS daily_change_percent
        |  FROM dedup)""".stripMargin)(
      """SELECT ROUND(AVG(close), 6) AS avg_close,
        |       ROUND(AVG(volume), 6) AS avg_volume,
        |       ROUND(AVG(daily_change_percent), 6) AS avg_daily_change_percent
        |FROM dcp""".stripMargin),

    "a5_quantiles" -> withCtes(stockCte, cleanCte, dedupCte)(
      """SELECT symbol,
        |  ROUND(quantile_cont(volume, 0.25), 6) AS vol_q1,
        |  ROUND(quantile_cont(volume, 0.50), 6) AS vol_q2,
        |  ROUND(quantile_cont(volume, 0.75), 6) AS vol_q3
        |FROM dedup GROUP BY symbol ORDER BY symbol""".stripMargin),

    "a7_stddev" -> withCtes(stockCte, cleanCte, dedupCte,
      """dcp AS (
        |  SELECT symbol,
        |    (close / LAG(close) OVER (PARTITION BY symbol ORDER BY "date") - 1) * 100 AS dcp
        |  FROM dedup)""".stripMargin)(
      """SELECT symbol, ROUND(STDDEV_SAMP(dcp), 6) AS stddev_dcp
        |FROM dcp GROUP BY symbol ORDER BY symbol""".stripMargin)
  )
}
