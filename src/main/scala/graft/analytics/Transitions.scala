package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Num

/** First-order Markov transition matrix over an event stream: for each
  * user's event sequence in event-time order, count (prev_type ->
  * event_type) transitions and derive the per-source-state transition
  * probability — the product-analytics "where do users go next" read,
  * and the input a path-recommendation / anomaly model trains on
  * (reference provenance: the reference has no event surface; this
  * extends the engine's events-table analytics next to [[Funnel]] /
  * [[Retention]]).
  *
  * Scale design (events is the 100 TB side):
  *   1. ONE user-keyed window pass computes each event's predecessor
  *      (lag over (ts, event_id) — event_id is the deterministic
  *      tiebreak for same-instant events, the [[Funnel]] convention).
  *      Per-user daily event streams are thousands of rows per key at
  *      most, so the per-partition sort is memory-resident; a dominant
  *      user degrades this window the same way it does ev1's, and the
  *      same salting escape applies if needed.
  *   2. Transition counting is a plain hash aggregate on (prev_type,
  *      event_type) — partial map-side combine reduces every partition
  *      to at most |event_types|^2 rows (tens), so the second exchange
  *      is matrix-sized, never event-sized.
  *   3. The probability denominator windows over the AGGREGATED matrix
  *      (per prev_type row sums — a handful of rows), never the events.
  *
  * p_transition is one exact-long division (bit-identical cross-engine;
  * rounded at 6 by convention).
  */
object Transitions {

  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n_transitions"))
    val wState = Window.partitionBy("prev_type")
    counts
      .withColumn("n_from_state", sum("n_transitions").over(wState))
      .withColumn("p_transition",
        Num.cround(
          col("n_transitions").cast("double") / col("n_from_state"), 6))
  }
}
