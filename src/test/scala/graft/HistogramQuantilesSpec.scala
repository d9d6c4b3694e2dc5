package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HistogramQuantiles

/** Semantics of the histogram (fixed-bin) quantile estimator. */
class HistogramQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("estimates land within one bin width of the exact percentile") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // two groups with very different ranges and shapes
    val rows = (0 until 4000).map { i =>
      if (i % 2 == 0) ("a", rnd.nextDouble() * 100.0)
      else ("b", 500.0 + math.pow(rnd.nextDouble(), 3) * 40.0)
    }
    val df = rows.toDF("k", "v")
    val est = HistogramQuantiles.estimate(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = df.groupBy("k").agg(
      percentile(col("v"), lit(0.25)), percentile(col("v"), lit(0.5)),
      percentile(col("v"), lit(0.75)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (k <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == k).map(_._2)
      val w = (vs.max - vs.min) / 128
      val (e1, e2, e3) = est(k); val (x1, x2, x3) = exact(k)
      assert(math.abs(e1 - x1) <= w && math.abs(e2 - x2) <= w
        && math.abs(e3 - x3) <= w,
        s"$k: est ($e1,$e2,$e3) vs exact ($x1,$x2,$x3), bin width $w")
    }
  }

  test("result is invariant to partitioning (mergeable bin counts)") {
    import spark.implicits._
    val rows = (0 until 1000).map(i => ("g", ((i * 7919) % 997).toDouble))
    val runs = Seq(1, 7).map { p =>
      HistogramQuantiles.estimate(rows.toDF("k", "v").repartition(p), "k", "v")
        .collect().head.toSeq
    }
    assert(runs(0) == runs(1))
  }

  test("constant group estimates every quantile at the constant; nulls ignored") {
    import spark.implicits._
    val df = Seq(("c", Some(7.5)), ("c", Some(7.5)), ("c", None))
      .toDF("k", "v")
    val r = HistogramQuantiles.estimate(df, "k", "v").collect().head
    assert(r.getLong(1) == 2L, "null values must not count")
    assert(r.getDouble(2) == 7.5 && r.getDouble(3) == 7.5 && r.getDouble(4) == 7.5)
  }

  test("the fact side never shuffles — only stats and (group, bin) aggregates") {
    import spark.implicits._
    val df = (0 until 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val plan = HistogramQuantiles.estimate(df, "k", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "per-group stats should broadcast back to the fact side")
  }
}
