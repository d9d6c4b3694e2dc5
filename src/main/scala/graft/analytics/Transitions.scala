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

  /** Stationary distribution of a transition-count kernel — `iters` power
    * iterations of pi' = pi P over `(prev_type, event_type, n)` counts.
    * The kernel is (event types)² — a bounded constant — so the whole
    * iteration collapses to ONE row of arrays and chained higher-order-
    * function projections: one exchange, one stage, no per-iteration
    * scheduling (a join-per-iteration form measured 9 s at sf0.1 — all
    * stage overhead on 5-row frames; contrast g1_pagerank, which keeps
    * the distributed join form because a general graph is NOT bounded).
    * Cross-engine: per-state sums (<= n_states doubles, kernel-sorted
    * order) round tie-safe at 12 each iteration so order ulps can't
    * compound; the report rounds at 6. Shared verbatim by the batch ev20
    * query and its streaming twin (the streamed transition facts fold
    * into the same counts — StreamingSpec proves the composition). */
  def stationaryDistribution(counts: DataFrame, iters: Int = 20): DataFrame = {
    val m = counts
      .withColumn("p", col("n").cast("double") /
        sum("n").over(Window.partitionBy("prev_type")))
    val stateRow = m.select(col("prev_type").as("st"))
      .union(m.select(col("event_type"))).distinct()
      .agg(sort_array(collect_list(col("st"))).as("states"))
    val kernelRow = m.agg(sort_array(collect_list(struct(
      col("prev_type").as("src"), col("event_type").as("dst"),
      col("p").as("p")))).as("kernel"))
    val one = stateRow.crossJoin(broadcast(kernelRow))
      .withColumn("pi0",
        transform(col("states"), _ => lit(1.0) / size(col("states"))))
    val iterated = (1 to iters).foldLeft(one) { (df, t) =>
      df.withColumn(s"pi$t", transform(col("states"), v =>
        Num.cround(aggregate(
          filter(col("kernel"), e => e.getField("dst") === v),
          lit(0.0),
          (acc, e) => acc + element_at(col(s"pi${t - 1}"),
            array_position(col("states"), e.getField("src")).cast("int"))
            * e.getField("p")),
          12)))
    }
    iterated
      .select(col(s"pi$iters"),
        posexplode(col("states")).as(Seq("pos", "state")))
      .select(col("state"), Num.cround(
        element_at(col(s"pi$iters"), col("pos").cast("int") + 1), 6)
        .as("pi_stationary"))
      .orderBy("state")
  }
}
