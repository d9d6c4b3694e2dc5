package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 13-item Great Expectations suite as Column-predicate
  * aggregates (reference: src/data_quality.py:8-128, operator A11).
  *
  * Each expectation evaluates in ONE shared aggregate pass over the frame
  * (partial+final hash agg — no per-check scans), then the single agg row is
  * exploded into one row per check. GX `mostly` semantics: the ratio is
  * computed over non-null values (avg ignores nulls), and a check passes when
  * observed_ratio >= threshold.
  */
object Expectations {

  /** (name, ratio expression over the frame, mostly-threshold). */
  private def checks(df: DataFrame): Seq[(String, Column, Double)] = {
    def exists(c: String): Column =
      lit(if (df.columns.contains(c)) 1.0 else 0.0)
    def notNullRatio(c: String): Column =
      avg(when(col(c).isNotNull, 1.0).otherwise(0.0))
    def betweenRatio(c: String, lo: Double, hi: Double): Column =
      avg(when(col(c).isNull, lit(null))
        .when(col(c) >= lo && col(c) <= hi, 1.0).otherwise(0.0))

    Seq(
      ("exists:symbol", exists("symbol"), 1.0),
      ("exists:date", exists("date"), 1.0),
      ("exists:close", exists("close"), 1.0),
      ("exists:volume", exists("volume"), 1.0),
      ("not_null:symbol", notNullRatio("symbol"), 1.0),
      ("not_null:date", notNullRatio("date"), 1.0),
      ("not_null:close", notNullRatio("close"), 1.0),
      ("between:open:0:10000", betweenRatio("open", 0, 10000), 1.0),
      ("between:high:0:10000", betweenRatio("high", 0, 10000), 1.0),
      ("between:low:0:10000", betweenRatio("low", 0, 10000), 1.0),
      ("between:close:0:10000", betweenRatio("close", 0, 10000), 1.0),
      ("between:volume:0:inf", avg(when(col("volume").isNull, lit(null))
        .when(col("volume") >= 0, 1.0).otherwise(0.0)), 1.0),
      ("between:daily_change_percent:-50:50",
        betweenRatio("daily_change_percent", -50, 50), 0.95),
      ("pair:high_gt_low", avg(when(col("high").isNull || col("low").isNull, lit(null))
        .when(col("high") > col("low"), 1.0).otherwise(0.0)), 1.0),
      // try_divide: ANSI mode throws on /0, and an EMPTY frame (all rows
      // filtered away) must produce a null ratio, not crash the report
      ("compound_unique:symbol_date",
        try_divide(countDistinct(col("symbol"), col("date")).cast("double"),
          count(lit(1))), 1.0)
    )
  }

  /** One row per expectation: (check_name, observed_ratio, threshold, passed).
    * `passed` is decided on the unrounded ratio; observed_ratio is rounded to
    * 6 decimals for engine-agnostic comparison. */
  def qualityReport(df: DataFrame): DataFrame = {
    val cs = checks(df)
    val aggCols = cs.zipWithIndex.map { case ((_, ratio, _), i) => ratio.as(s"__r$i") }
    val aggRow = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = cs.zipWithIndex.map { case ((name, _, thr), i) =>
      struct(
        lit(name).as("check_name"),
        col(s"__r$i").as("observed_ratio"),
        lit(thr).as("threshold"))
    }
    aggRow.select(explode(array(rows: _*)).as("c"))
      .select(col("c.check_name"), col("c.observed_ratio"), col("c.threshold"))
      .withColumn("passed", col("observed_ratio") >= col("threshold"))
      .withColumn("observed_ratio", graft.ops.Num.cround(col("observed_ratio"), 6))
      .orderBy("check_name")
  }

  /** Overall pass rate with the reference's >= 90% gate
    * (src/data_quality.py:222). */
  def passRate(report: DataFrame, gate: Double = 0.9): DataFrame =
    report.agg(
      count(lit(1)).as("total_checks"),
      sum(when(col("passed"), 1L).otherwise(0L)).as("passed_checks"))
      .withColumn("pass_rate", col("passed_checks") / col("total_checks"))
      .withColumn("overall_success", col("pass_rate") >= gate)
}
