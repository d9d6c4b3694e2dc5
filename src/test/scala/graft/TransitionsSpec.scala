package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Transitions

/** Semantics of the Markov transition matrix on a hand fixture. */
class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("counts ordered pairs per user; probabilities per source state; event_id breaks ts ties") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, t(0), 10L, "view", 1.0),
      (2L, t(1), 10L, "click", 1.0),
      (3L, t(2), 10L, "click", 1.0),
      (4L, t(3), 10L, "purchase", 1.0),
      (5L, t(0), 20L, "click", 1.0),
      (6L, t(1), 20L, "purchase", 1.0),
      // user 30: same-instant pair — event_id must decide view -> click
      (7L, t(0), 30L, "view", 1.0),
      (8L, t(0), 30L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    val m = Transitions.eventTransitions(events)
      .orderBy("prev_type", "event_type").collect()
    val triples = m.map(r => (r.getAs[String]("prev_type"),
      r.getAs[String]("event_type"), r.getAs[Long]("n_transitions"))).toSeq
    assert(triples == Seq(
      ("click", "click", 1L),
      ("click", "purchase", 2L),
      ("view", "click", 2L)))
    val probs = m.map(_.getAs[Double]("p_transition"))
    assert(math.abs(probs(0) - 1.0 / 3) < 1e-5)
    assert(math.abs(probs(1) - 2.0 / 3) < 1e-5)
    assert(math.abs(probs(2) - 1.0) < 1e-5)
    assert(m.forall(r => r.getAs[Long]("n_from_state") ==
      (if (r.getAs[String]("prev_type") == "click") 3L else 2L)))
  }

  test("single-event users contribute no transitions") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, ts0, 1L, "view", 1.0),
      (2L, ts0, 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Transitions.eventTransitions(events).count() == 0)
  }

  test("stationary distribution converges to the analytic fixed point of a 2-state chain") {
    // Kernel: A -> B always; B -> A half, B -> B half. Balance equations:
    // piA = 0.5 piB, piA + piB = 1  =>  piA = 1/3, piB = 2/3. The second
    // eigenvalue is -0.5, so 20 iterations from uniform sit within
    // 0.5^20 ~ 1e-6 of the fixed point.
    val counts = Seq(
      ("A", "B", 2L),   // p(A->B) = 1
      ("B", "A", 1L),   // p(B->A) = 0.5
      ("B", "B", 1L))   // p(B->B) = 0.5
      .toDF("prev_type", "event_type", "n")
    val out = Transitions.stationaryDistribution(counts).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("A") - 1.0 / 3) < 1e-4, s"piA = ${out("A")}")
    assert(math.abs(out("B") - 2.0 / 3) < 1e-4, s"piB = ${out("B")}")
  }

  test("removal attribution: hand chain with closed-form effects") {
    // u10: view -> click -> purchase; u20: view -> click.
    // T(view, click) = 2/2 = 1, T(click, purchase) = 1/2 (one click ends
    // a sequence -> drop-out). Starts: view only. So p_convert = 0.5;
    // removing EITHER channel severs the only path: p_removed = 0,
    // removal_effect = 0.5, shares split 0.5 / 0.5. The chain is acyclic
    // depth 2, so horizon 20 is exact, not approximate.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, t(0), 10L, "view", 1.0),
      (2L, t(1), 10L, "click", 1.0),
      (3L, t(2), 10L, "purchase", 1.0),
      (4L, t(0), 20L, "view", 1.0),
      (5L, t(1), 20L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Transitions.removalAttribution(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("view", "click"))
    Seq("view", "click").foreach { ch =>
      val r = out(ch)
      assert(math.abs(r.getAs[Double]("p_convert") - 0.5) < 1e-6, s"$ch: $r")
      assert(math.abs(r.getAs[Double]("p_removed")) < 1e-6, s"$ch: $r")
      assert(math.abs(r.getAs[Double]("removal_effect") - 0.5) < 1e-6)
      assert(math.abs(r.getAs[Double]("attribution_share") - 0.5) < 1e-6)
    }
  }

  test("removal attribution: an off-path channel earns zero credit, shares renormalize") {
    // u1: view -> click -> purchase (twice over two users); u3: view ->
    // error (dead end). error sits OFF every converting path: removing it
    // must not change conversion, so its effect is ~0 and view/click keep
    // the whole credit. (Tiny negative-rounding drift from the cround
    // epsilon is absorbed by the 1e-4 tolerance.)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, t(0), 1L, "view", 1.0),
      (2L, t(1), 1L, "click", 1.0),
      (3L, t(2), 1L, "purchase", 1.0),
      (4L, t(0), 2L, "view", 1.0),
      (5L, t(1), 2L, "click", 1.0),
      (6L, t(2), 2L, "purchase", 1.0),
      (7L, t(0), 3L, "view", 1.0),
      (8L, t(1), 3L, "error", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Transitions.removalAttribution(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("view", "click", "error"))
    assert(math.abs(out("error").getAs[Double]("removal_effect")) < 1e-4)
    assert(out("click").getAs[Double]("removal_effect") > 0.1)
    assert(out("view").getAs[Double]("removal_effect") > 0.1)
    val shareSum = Seq("view", "click", "error")
      .map(out(_).getAs[Double]("attribution_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares must renormalize: $shareSum")
  }

  test("removal attribution: no conversions -> zero effects, NULL shares") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, t(0), 1L, "view", 1.0),
      (2L, t(1), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Transitions.removalAttribution(events).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("p_convert")) < 1e-6)
      assert(math.abs(r.getAs[Double]("removal_effect")) < 1e-6)
      assert(r.isNullAt(r.fieldIndex("attribution_share")),
        s"share must be NULL when nothing converts: $r")
    }
  }
}
