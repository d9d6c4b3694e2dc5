package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.ops.Num

/** Streaming twin of `analytics/Retention.cohortRetention` (the last
  * event-analytics operator without a stream==batch proof — ev1's funnel
  * and ev6's transitions already carry theirs): a daily-ingest deployment
  * computes the retention triangle INCREMENTALLY, folding each
  * micro-batch into per-user state instead of re-scanning history.
  *
  * State per user is (cohort week, distinct active-week set, events
  * seen): the set is bounded by the CALENDAR — at most ~52 entries per
  * user-year regardless of how hot the user is — the same bounded-state
  * argument the batch operator makes for its `collect_set`, now applied
  * to the state store. Weeks are stored as days-since-epoch ints so the
  * state encoder stays flat (no date boxing).
  *
  * Emission is Update-mode snapshots (one row per touched user per
  * micro-batch, `n_events_seen` monotone so "latest" is selectable
  * downstream — the [[StreamingFunnel]] contract); [[fromSnapshots]]
  * turns the latest snapshot per user into the exact batch output shape,
  * so `fromSnapshots(latest snapshots) == Retention.cohortRetention(all
  * events so far)` — StreamingSpec drives three time-ordered
  * micro-batches through a real file stream and proves frame equality,
  * including users whose activity spans batches. Unlike the funnel twin
  * there is no order sensitivity at all: cohort is a min and the week
  * set is a union, both order-insensitive, so the equality holds under
  * ANY event arrival order, not just event-time-ordered batches.
  */
object StreamingRetention {

  case class REvent(user_id: Long, week_days: Int)

  /** Per-user state AND emitted snapshot: cohort week + active weeks as
    * days-since-epoch, plus the monotone events-seen counter. */
  case class RetSnapshot(user_id: Long, cohort_days: Int,
                         week_set: Seq[Int], n_events_seen: Long)

  private def advance(user: Long, evs: Iterator[REvent],
                      st: org.apache.spark.sql.streaming.GroupState[RetSnapshot]
                     ): RetSnapshot = {
    val ws = evs.map(_.week_days).toSeq
    val prev = st.getOption
    val set = (prev.map(_.week_set).getOrElse(Nil) ++ ws).distinct.sorted
    val snap = RetSnapshot(user, set.head, set,
      prev.map(_.n_events_seen).getOrElse(0L) + ws.size)
    st.update(snap)
    snap
  }

  /** Project an events frame (batch or stream) onto the retention input
    * shape: (user_id, activity week as days since epoch). */
  def toRetentionEvents(spark: SparkSession,
                        events: DataFrame): Dataset[REvent] = {
    import spark.implicits._
    val ev = graft.io.Sources.normalizeEventTs(events)
    ev.select(col("user_id"),
        datediff(date_trunc("week", col("ts")).cast("date"),
          to_date(lit("1970-01-01"))).cast("int").as("week_days"))
      .as[REvent]
  }

  /** The per-user snapshot stream (Update mode). */
  def retentionStream(spark: SparkSession,
                      events: Dataset[REvent]): Dataset[RetSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(advance)
  }

  /** Fold the LATEST snapshot per user into the batch operator's exact
    * output: (cohort_week, week_offset, n_users, cohort_size, retention).
    * Mirrors `Retention.cohortRetention` stages 2-3 — explode the
    * (already-distinct) week sets, count per (cohort, offset), window the
    * offset-0 denominator over the aggregated frame only. Run inside
    * `foreachBatch` (or over a memory-sink table) to publish the live
    * retention triangle each micro-batch. */
  def fromSnapshots(latest: DataFrame): DataFrame = {
    val counts = latest
      .select(col("cohort_days"), explode(col("week_set")).as("wd"))
      .withColumn("week_offset",
        ((col("wd") - col("cohort_days")) / 7).cast("int"))
      .groupBy("cohort_days", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val byCohort = Window.partitionBy("cohort_days")
    counts
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(byCohort))
      .withColumn("retention",
        Num.cround(col("n_users").cast("double") / col("cohort_size"), 6))
      .withColumn("cohort_week",
        date_add(to_date(lit("1970-01-01")), col("cohort_days")))
      .select("cohort_week", "week_offset", "n_users", "cohort_size",
        "retention")
  }
}
