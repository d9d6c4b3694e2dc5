package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Num, TemporalJoins}

/** Multi-touch attribution over the events log (reference scope: the
  * pipeline's event analytics stop at funnels — attribution is the
  * standard next report a marketing stack derives from the same log).
  *
  * Linear model: every purchase's value splits EQUALLY across the user's
  * view/click touches in the strictly-preceding `windowDays`; purchases
  * with no in-window touch credit the 'direct' channel whole.
  *
  * Shape at scale: the (purchase × touch) pairing is a per-user interval
  * join expressed through [[graft.ops.TemporalJoins.rangeJoinBucketed]]
  * (touches as points on the microsecond axis, the pre-purchase window as
  * ranges, bucketWidth = the window length) — a plain (user, time-bucket)
  * equi-join, never a theta join; each range replicates to at most 2
  * buckets. Pair volume is |purchases| × touches-per-user-window — linear
  * in the log. The per-purchase touch count is a window over the pair
  * table and the output is a channels-sized aggregate. */
object Attribution {

  def linearAttribution(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val windowUs = windowDays.toLong * 86400 * 1000000L
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val touches = events.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
    val pairs = TemporalJoins.rangeJoinBucketed(
      touches, expr("unix_micros(t_ts)"),
      purchases, expr("unix_micros(p_ts)") - windowUs, expr("unix_micros(p_ts)"),
      bucketWidth = windowUs, keys = Seq((col("t_user"), col("p_user"))))
    // Exact-decimal summation: shares round tie-safe to 6 dp, then sum as
    // DECIMAL(38,6) — integer arithmetic, associative, so the distributed
    // partial-agg order can't move an ulp the way a double sum does (at
    // sf1.0 the channel totals reach ~5e6 over ~2e5 terms, where double
    // summation-order noise lands exactly on the 6-dp rounding knife edge).
    // A double is never exactly half of 1e-6 at these magnitudes, so the
    // per-term double->decimal rounding agrees across engines.
    val shared = pairs
      .withColumn("n_touch", count(lit(1)).over(Window.partitionBy("p_id")))
      .withColumn("share", Num.cround(col("p_value") / col("n_touch"), 6)
        .cast("decimal(38,6)"))
    val touched = shared.groupBy("channel")
      .agg(count(lit(1)).as("n_attributions"),
        sum("share").cast("double").as("attributed_value"))
    // The direct branch is a global aggregate and would emit one
    // (0, null) row even when every purchase has touches; the streaming
    // twin (which groups by key) emits nothing in that case — drop the
    // empty row so batch == stream holds on touch-saturated corpora.
    val direct = purchases
      .join(shared.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n_attributions"),
        sum(Num.cround(col("p_value"), 6).cast("decimal(38,6)"))
          .cast("double").as("attributed_value"))
      .withColumn("channel", lit("direct"))
      .select("channel", "n_attributions", "attributed_value")
      .filter(col("n_attributions") > 0)
    touched.unionByName(direct)
  }
}
