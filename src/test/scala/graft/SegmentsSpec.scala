package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Segments

/** k-means RFM semantics on hand fixtures — the oracle cross-check proves
  * engine==engine; these pin engine==MATH. */
class SegmentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-15 12:00:00")
  private def day(off: Int, m: Int = 0) =
    new java.sql.Timestamp(ts0.getTime + off * 86400000L + m * 60000L)

  test("two planted behavioral corners separate into two exact segments") {
    // Group A (users 1-3): one OLD purchase, huge value -> normalized
    // (nr, nf, nm) = (1, 0, 1). Group B (users 4-6): ten purchases on the
    // corpus max day, total value 10 -> (0, 1, 0). A sits nearest seed
    // c1, B nearest seed c0; the first update pins the centroids onto the
    // corners, so the report is exact. B's high-value VIEW events must
    // not leak into monetary (purchase-only base, the ev10 convention).
    val a = (1L to 3L).map(u => (u * 10, day(-10), u, "purchase", 1000.0))
    val b = (4L to 6L).flatMap { u =>
      (0 until 10).map(i => (u * 100 + i, day(0, i), u, "purchase", 1.0)) :+
        ((u * 100 + 50, day(0), u, "view", 99999.0))
    }
    val events = (a ++ b)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Segments.rfmSegments(events).collect()
    assert(out.length == 2, s"expected 2 non-empty segments: ${out.toSeq}")
    val byUsers = out.map(r => r.getAs[Double]("avg_monetary") -> r).toMap
    val rich = byUsers(1000.0); val busy = byUsers(10.0)
    assert(rich.getAs[Long]("n_users") == 3L &&
      rich.getAs[Double]("avg_recency_days") == 10.0, s"$rich")
    assert(busy.getAs[Long]("n_users") == 3L &&
      busy.getAs[Double]("avg_recency_days") == 0.0 &&
      busy.getAs[Double]("avg_frequency") == 10.0, s"$busy")
  }

  test("an indivisible cloud collapses to one segment holding the global means") {
    // Six identical users: every feature normalizes to the flat-range 0,
    // all land on one centroid, empty clusters keep their seeds and stay
    // empty — the report is ONE row with the global means.
    val events = (1L to 6L).map(u => (u, day(-3), u, "purchase", 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Segments.rfmSegments(events).collect()
    assert(out.length == 1, s"${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("n_users") == 6L)
    assert(r.getAs[Double]("avg_recency_days") == 0.0) // max day IS their day
    assert(r.getAs[Double]("avg_frequency") == 1.0)
    assert(r.getAs[Double]("avg_monetary") == 50.0)
  }
}
