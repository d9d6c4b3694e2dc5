package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Retention

/** Semantics of the weekly cohort retention triangle. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")

  test("cohorts by first ISO week; offsets count distinct active users") {
    import spark.implicits._
    // 2024-01-01 and 2024-01-08 are Mondays. u1,u2 start week 0; u1 is
    // back in week 1; u2 is not; u3 starts in week 1. Repeat events in
    // the same week must not double-count.
    val events = Seq(
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")), (1L, ts("2024-01-09")),
      (2L, ts("2024-01-04")),
      (3L, ts("2024-01-10")), (3L, ts("2024-01-10"))
    ).toDF("user_id", "ts")
    val out = Retention.cohortRetention(events)
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "n_users", "cohort_size", "retention")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toList
    assert(out == List(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0)))
  }

  test("rolling active users: in-window dedup, gap days, max-day cap") {
    import spark.implicits._
    // u1 twice on day 1 and once on day 3 (counts once per window); u2
    // day 1 only. Day 2 has no events but both users are still
    // rolling-active (dau = 0, wau = 2); the curve stops at the last
    // observed day (no contribution days past Jan 3).
    val events = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-01")), (1L, ts("2024-01-03")),
      (2L, ts("2024-01-01"))
    ).toDF("user_id", "ts")
    val out = graft.analytics.ActiveUsers.rollingActive(events)
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toList
    assert(out == List(
      ("2024-01-01", 2L, 2L),
      ("2024-01-02", 0L, 2L),
      ("2024-01-03", 1L, 2L)))
  }

  test("randomized equivalence with a brute-force pandas-style computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val events = (0 until 2000).map { _ =>
      (rnd.nextInt(40).toLong, ts(f"2024-${1 + rnd.nextInt(3)}%02d-${1 + rnd.nextInt(28)}%02d"))
    }
    val out = Retention.cohortRetention(events.toDF("user_id", "ts"))
      .select("cohort_week", "week_offset", "n_users")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap

    // brute force on the driver
    def monday(d: java.time.LocalDate) = d.`with`(java.time.DayOfWeek.MONDAY)
    val userWeeks = events.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => monday(e._2.toLocalDateTime.toLocalDate)).distinct
    }
    val expect = userWeeks.toSeq.flatMap { case (_, ws) =>
      val cohort = ws.min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      ws.map(w => (cohort.toString,
        ((w.toEpochDay - cohort.toEpochDay) / 7).toInt))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == expect)
  }
}
