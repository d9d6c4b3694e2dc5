package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Derive
import graft.streaming.StatefulFeatures
import graft.streaming.StatefulFeatures.Bar

/** Stateful streaming features must agree with the batch window derivation,
  * including across micro-batch boundaries (state carry-over). */
class StatefulFeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bars(symbol: String, from: Int, to: Int): Seq[Bar] =
    (from to to).map { i =>
      Bar(symbol, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        100.0 + i + (if (symbol == "B") 50 else 0))
    }

  private def batchMa5(all: Seq[Bar]): Map[(String, String), Double] = {
    val df = all.toDF()
      .withColumn("open", col("close")).withColumn("high", col("close") + 1)
      .withColumn("low", col("close") - 1).withColumn("volume", lit(100L))
    Derive.addDerived(df).collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[java.sql.Date]("date").toString) ->
        r.getAs[Double]("ma_5")).toMap
  }

  test("batch execution of the stateful deriver matches window-based ma_5") {
    val all = bars("A", 0, 24) ++ bars("B", 0, 9)
    val stateful = StatefulFeatures.derive(spark, all.toDS()).collect()
      .map(f => (f.symbol, f.date.toString) -> f.ma_5).toMap
    val expected = batchMa5(all)
    assert(stateful.keySet == expected.keySet)
    stateful.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9, k) }
  }

  test("state carries across micro-batches (streaming run, two batches)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Bar]
    val query = StatefulFeatures.derive(spark, input.toDS())
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode(OutputMode.Append).start()

    input.addData(bars("A", 0, 9): _*)
    query.processAllAvailable()
    input.addData(bars("A", 10, 14): _*)
    query.processAllAvailable()
    query.stop()

    val got = spark.table("stateful_out").collect()
      .map(r => r.getAs[java.sql.Date]("date").toString -> r.getAs[Double]("ma_5")).toMap
    val expected = batchMa5(bars("A", 0, 14))
      .map { case ((_, d), v) => d -> v }
    assert(got.size == 15)
    // day 12 (index 11) ma_5 spans the batch boundary: closes of days 7..11
    expected.foreach { case (d, v) => assert(math.abs(got(d) - v) < 1e-9, d) }
  }
}
