package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of `analytics/ActiveUsers.rollingActive` — with this,
  * every event-analytics operator in the engine carries a stream==batch
  * proof (funnel ev1, transitions ev6, retention ev5, rolling actives
  * ev9): a live DAU/WAU dashboard folds each micro-batch into per-user
  * state instead of re-scanning the event log.
  *
  * State per user is (distinct active-day set, events seen): bounded by
  * the CALENDAR (~365 ints per user-year, independent of event volume) —
  * the daily analog of [[StreamingRetention]]'s week-set argument. Days
  * are stored as days-since-epoch ints for a flat state encoder.
  *
  * Emission is Update-mode snapshots with a monotone `n_events_seen`
  * (the [[StreamingFunnel]]/[[StreamingRetention]] "latest" contract);
  * [[fromSnapshots]] folds the latest snapshot per user through the
  * batch operator's exact contribution-expansion algorithm, so
  * `fromSnapshots(latest) == ActiveUsers.rollingActive(all events so
  * far)`. Day-set union is order-insensitive, so the equality holds
  * under ANY event arrival order — StreamingSpec drives user-hash-
  * SHUFFLED micro-batches, the stronger contract retention also proves.
  */
object StreamingActiveUsers {

  case class AEvent(user_id: Long, day: Int)

  /** Per-user state AND emitted snapshot. */
  case class ActiveSnapshot(user_id: Long, day_set: Seq[Int],
                            n_events_seen: Long)

  private def advance(user: Long, evs: Iterator[AEvent],
                      st: org.apache.spark.sql.streaming.GroupState[ActiveSnapshot]
                     ): ActiveSnapshot = {
    val ds = evs.map(_.day).toSeq
    val prev = st.getOption
    val set = (prev.map(_.day_set).getOrElse(Nil) ++ ds).distinct.sorted
    val snap = ActiveSnapshot(user, set,
      prev.map(_.n_events_seen).getOrElse(0L) + ds.size)
    st.update(snap)
    snap
  }

  /** Project an events frame (batch or stream) onto (user, day-int). */
  def toActiveEvents(spark: SparkSession, events: DataFrame): Dataset[AEvent] = {
    import spark.implicits._
    val ev = graft.io.Sources.normalizeEventTs(events)
    ev.select(col("user_id"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          to_date(lit("1970-01-01"))).cast("int").as("day"))
      .as[AEvent]
  }

  /** The per-user snapshot stream (Update mode). */
  def activeStream(spark: SparkSession,
                   events: Dataset[AEvent]): Dataset[ActiveSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(advance)
  }

  /** Fold the LATEST snapshot per user into the batch operator's exact
    * output (day, dau, wau): explode the already-distinct day sets, run
    * the same bounded contribution expansion and counts as
    * `ActiveUsers.rollingActive`. */
  def fromSnapshots(latest: DataFrame, windowDays: Int = 7): DataFrame = {
    val daily = latest
      .select(col("user_id"), explode(col("day_set")).as("__d"))
      .select(col("user_id"),
        date_add(to_date(lit("1970-01-01")), col("__d")).as("day"))
    graft.analytics.ActiveUsers.rollingActive(
      // rollingActive consumes (user_id, ts); feed the day back as a
      // midnight timestamp so one code path serves both twins
      daily.select(col("user_id"), col("day").cast("timestamp").as("ts")))
  }
}
