package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `analytics/Attribution.linearAttribution`: emit each
  * purchase's attribution facts (one (channel, share) per in-window touch,
  * or a single 'direct' fact) the moment the purchase arrives.
  *
  * State per user is the touch history STILL INSIDE the attribution
  * window — every event at time T evicts touches older than T - window
  * (safe under the surface's event-time-order contract: any later purchase
  * has ts >= T, so an evicted touch can never re-qualify). The state store
  * therefore holds touches-per-user-per-window, the same bound that makes
  * the batch interval join linear — NOT the full history.
  *
  * Determinism twin-contract: a touch at exactly the purchase timestamp is
  * NOT strictly preceding — events fold in (ts, purchase-first) order, so
  * the same-instant touch is not yet in state when the purchase attributes
  * (the batch form's half-open `t_ts < p_ts` bound). Shares are the same
  * IEEE `value / n` doubles the batch side divides, so aggregating the
  * fact stream with the batch's decimal-sum discipline reproduces
  * `linearAttribution` exactly; StreamingSpec proves it over >= 3
  * time-ordered micro-batches, including purchases whose touches arrived
  * in EARLIER batches.
  */
object StreamingAttribution {

  case class AttrEvent(user_id: Long, event_type: String, ts_us: Long,
                       value: Option[Double])
  case class Touch(ts_us: Long, channel: String)
  case class AttrState(touches: List[Touch])
  case class AttrFact(user_id: Long, channel: String, share: Option[Double])

  /** purchases fold BEFORE touches at an equal timestamp — the half-open
    * window bound. */
  private def rank(t: String): Int = if (t == "purchase") 0 else 1

  private def advance(windowUs: Long)(
      user: Long, evs: Iterator[AttrEvent],
      st: GroupState[AttrState]): Iterator[AttrFact] = {
    val sorted = evs.toSeq.sortBy(e => (e.ts_us, rank(e.event_type)))
    var touches = st.getOption.map(_.touches).getOrElse(Nil)
    val out = Seq.newBuilder[AttrFact]
    sorted.foreach { e =>
      e.event_type match {
        case "purchase" =>
          val inWin = touches.filter(t =>
            t.ts_us >= e.ts_us - windowUs && t.ts_us < e.ts_us)
          if (inWin.isEmpty) out += AttrFact(user, "direct", e.value)
          else {
            val share = e.value.map(_ / inWin.size)
            inWin.foreach(t => out += AttrFact(user, t.channel, share))
          }
          touches = touches.filter(_.ts_us >= e.ts_us - windowUs)
        case "view" | "click" =>
          touches = (Touch(e.ts_us, e.event_type) :: touches)
            .filter(_.ts_us >= e.ts_us - windowUs)
        case _ => ()
      }
    }
    st.update(AttrState(touches))
    out.result().iterator
  }

  /** Project an events frame (batch or stream) onto the attribution input
    * shape; microsecond longs keep the state encoder flat. */
  def toAttrEvents(spark: SparkSession, events: DataFrame): Dataset[AttrEvent] = {
    import spark.implicits._
    val ev = graft.io.Sources.normalizeEventTs(events)
    ev.select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"), col("value"))
      .as[AttrEvent]
  }

  /** The per-attribution fact stream (Append mode — each fact is final
    * when its purchase arrives). */
  def attributionStream(spark: SparkSession, events: Dataset[AttrEvent],
                        windowDays: Int = 7): Dataset[AttrFact] = {
    import spark.implicits._
    val windowUs = windowDays.toLong * 86400 * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(advance(windowUs))
  }

  /** Fold an accumulated fact table into the batch report's shape —
    * the same tie-safe-rounded DECIMAL(38,6) summation
    * `linearAttribution` uses, so equality against the batch output is
    * exact, not approximate. */
  def fromFacts(facts: DataFrame): DataFrame =
    facts.groupBy("channel")
      .agg(count(lit(1)).as("n_attributions"),
        sum(graft.ops.Num.cround(col("share"), 6).cast("decimal(38,6)"))
          .cast("double").as("attributed_value"))
}
