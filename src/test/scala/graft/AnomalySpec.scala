package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Anomaly

/** Volume-anomaly semantics on a planted spike. */
class AnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a spike flags against its trailing baseline; flat baselines are excluded") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(h: Int, i: Int) = new java.sql.Timestamp(base + h * 3600000L + i * 1000L)
    // type a: jittered ~10/hour for 10 hours, then a 100-event spike
    val countsA = Seq(9, 11, 10, 9, 11, 10, 9, 11, 10, 9, 100)
    val evsA = countsA.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (h * 1000L + i, ts(h, i), 1L, "a", 1.0))
    }
    // type b: perfectly flat 5/hour — zero-variance baseline, excluded
    val evsB = (0 until 11).flatMap(h =>
      (0 until 5).map(i => (900000L + h * 100 + i, ts(h, i), 2L, "b", 1.0)))
    val df = (evsA ++ evsB).toDF("event_id", "ts", "user_id", "event_type", "value")

    val out = Anomaly.volumeAnomalies(df).orderBy("event_type", "hour").collect()
    assert(out.forall(_.getAs[String]("event_type") == "a"),
      "flat-baseline type b must be excluded entirely")
    // type a emits rows 9..11 (8-observation warm-up), spike hour flagged
    assert(out.length == 3)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Long]("n_events") == 100L)
    assert(flagged.head.getAs[Double]("vol_z") > 50)
    assert(out.filter(!_.getAs[Boolean]("is_anomaly"))
      .forall(r => math.abs(r.getAs[Double]("vol_z")) < 3))
  }
}
