package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnel over the events table: view -> click ->
  * purchase in strict event-time order — each stage's first timestamp must
  * be strictly AFTER the previous stage's first timestamp (the standard
  * product-analytics funnel definition: a click before the user ever viewed
  * does not advance the funnel). Extends the events analytics surface next
  * to sessionization (st2) and interval attribution (st3); the reference
  * pipeline has no event funnel — this is part of the extension surface.
  *
  * Shape at scale: ONE hash exchange on user_id serves all three
  * min-over-partition window passes (identical partitioning — Catalyst
  * reuses the exchange and the sort) and the final per-user aggregate
  * collapses on the same key, so the whole funnel is a single shuffle whose
  * rows are (user, type, ts) triples; per-user window state is O(1) running
  * minima, no frames, no self-joins. Skew is bounded by events-per-user.
  */
object Funnel {

  /** Per-user funnel row: first_view/click/purchase as exact microsecond
    * longs (null when the stage was never reached in order) and
    * funnel_stage 0-3 = number of stages completed. */
  def userFunnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("__v",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("__c",
        min(when(col("event_type") === "click" && col("ts") > col("__v"),
          col("ts"))).over(w))
      .withColumn("__p",
        min(when(col("event_type") === "purchase" && col("ts") > col("__c"),
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(
        min(expr("unix_micros(__v)")).as("first_view_us"),
        min(expr("unix_micros(__c)")).as("first_click_us"),
        min(expr("unix_micros(__p)")).as("first_purchase_us"))
      .withColumn("funnel_stage",
        when(col("first_purchase_us").isNotNull, 3)
          .when(col("first_click_us").isNotNull, 2)
          .when(col("first_view_us").isNotNull, 1)
          .otherwise(0))
  }
}
