package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Num

/** Event-volume anomaly detection — the data-level monitoring twin of the
  * run-level [[Alerts]]: bucket events into per-type hourly counts and
  * z-score each hour against its own trailing 24-observed-hour baseline
  * (frame EXCLUDES the current row, so a spike never inflates its own
  * threshold — the self-masking trap w13's median/MAD form also avoids;
  * here the rolling baseline makes plain mean/stddev the standard choice,
  * and w13 remains the robust global form).
  *
  * Scale design: the events table reduces map-side to (hour, type)
  * counts — at ANY corpus size the windowed frame is hours x types rows
  * (thousands per year), so the baseline windows never touch the raw
  * events. Warm-up hours (fewer than 8 prior observations) and
  * zero-variance baselines (constant counts — the z is undefined, and
  * both engines agree variance of equal ints is exactly 0) are excluded.
  * The anomaly flag compares the tie-safe-ROUNDED |z| (w13 convention) so
  * a cross-engine stddev ulp can never flip a row's flag.
  */
object Anomaly {

  def volumeAnomalies(events: DataFrame, threshold: Double = 3.0): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    val frame = w.rowsBetween(-24, -1)
    val z = (col("n_events") - col("avg_24")) / col("sd_24")
    hourly
      .withColumn("rn", row_number().over(w))
      .withColumn("avg_24", avg("n_events").over(frame))
      .withColumn("sd_24", stddev_samp("n_events").over(frame))
      .filter(col("rn") > 8 && col("sd_24") > 0)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n_events"),
        Num.cround(col("avg_24"), 2).as("avg_24"),
        Num.cround(z, 2).as("vol_z"),
        (Num.cround(abs(z), 6) > lit(threshold)).as("is_anomaly"))
  }
}
