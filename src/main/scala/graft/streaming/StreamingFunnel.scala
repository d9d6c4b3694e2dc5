package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `analytics/Funnel.userFunnel` (round-7 verdict item:
  * ev1 was the last batch-only analytics operator). Same strict-order
  * view -> click -> purchase semantics, carried incrementally as per-user
  * state in `flatMapGroupsWithState`.
  *
  * State per user is THREE optional microsecond longs plus a counter —
  * O(1), independent of history length, so the state store holds
  * |users| x ~48 bytes at any corpus scale. Each stage's slot is set at
  * most once: events are folded in (ts, stage-rank) order, so the first
  * qualifying event per stage IS the stage minimum, exactly the batch
  * window's `min(when(...))` semantics (stage-rank breaks same-ts ties the
  * same way the batch form's STRICT `>` does: a click at exactly the
  * first-view timestamp is rejected by both).
  *
  * Equivalence contract: incremental == batch when micro-batches arrive in
  * event-time order (the watermark discipline the rest of the streaming
  * surface assumes; within-batch disorder is absorbed by the per-batch
  * sort). A regression that re-delivers pre-watermark events is a replay —
  * rerun the batch funnel. StreamingSpec drives >= 2 time-ordered
  * micro-batches and hash-compares the final snapshot against ev1's batch
  * result.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  case class FunnelState(v: Option[Long], c: Option[Long], p: Option[Long],
                         n_events: Long)
  case class FunnelRow(user_id: Long, first_view_us: Option[Long],
                       first_click_us: Option[Long],
                       first_purchase_us: Option[Long],
                       funnel_stage: Int, n_events_seen: Long)

  private def stageRank(t: String): Int = t match {
    case "view" => 0
    case "click" => 1
    case "purchase" => 2
    case _ => 3
  }

  private def advance(user: Long, evs: Iterator[FunnelEvent],
                      st: GroupState[FunnelState]): Iterator[FunnelRow] = {
    val sorted = evs.toSeq.sortBy(e => (e.ts_us, stageRank(e.event_type)))
    var s = st.getOption.getOrElse(FunnelState(None, None, None, 0L))
    sorted.foreach { e =>
      s = (e.event_type match {
        case "view" if s.v.isEmpty => s.copy(v = Some(e.ts_us))
        case "click" if s.c.isEmpty && s.v.exists(e.ts_us > _) =>
          s.copy(c = Some(e.ts_us))
        case "purchase" if s.p.isEmpty && s.c.exists(e.ts_us > _) =>
          s.copy(p = Some(e.ts_us))
        case _ => s
      }).copy(n_events = s.n_events + 1)
    }
    st.update(s)
    Iterator.single(FunnelRow(user, s.v, s.c, s.p,
      if (s.p.isDefined) 3 else if (s.c.isDefined) 2
      else if (s.v.isDefined) 1 else 0,
      s.n_events))
  }

  /** Project an events frame (batch or stream) onto the funnel input shape.
    * Microsecond longs rather than Timestamp keep the state encoder flat. */
  def toFunnelEvents(spark: SparkSession, events: DataFrame): Dataset[FunnelEvent] = {
    import spark.implicits._
    // shared ts normalization (nanos-long / TIMESTAMP / TIMESTAMP_NTZ),
    // same rule as the batch reader
    val ev = graft.io.Sources.normalizeEventTs(events)
    ev.select(col("user_id"),
      col("event_type"), expr("unix_micros(ts)").as("ts_us"))
      .as[FunnelEvent]
  }

  /** Per-user funnel snapshots, one row per user per micro-batch that
    * touched the user (Update mode); the latest snapshot (max
    * n_events_seen) is the funnel state so far. Runs on batch Datasets too
    * (single-group-pass), which is what the equivalence spec exploits. */
  def userFunnelStream(spark: SparkSession,
                       events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(advance)
  }
}
