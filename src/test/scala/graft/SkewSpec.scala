package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted two-phase aggregation must agree with the direct aggregate. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedSumCount equals plain groupBy on a skewed key distribution") {
    // hot key: 10k rows of 'HOT', 100 of everything else
    val rows = (1 to 10000).map(i => ("HOT", i.toDouble)) ++
      (1 to 100).flatMap(i => Seq(("a", i.toDouble), ("b", i * 2.0)))
    val df = rows.toDF("k", "v").repartition(8)

    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(df, "k", "v")
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("sum_v"), r.getAs[Long]("cnt"))).toMap

    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(c == direct(k)._2, s"count for $k")
      assert(math.abs(s - direct(k)._1) < 1e-6, s"sum for $k")
    }
  }

  test("keyHistogram surfaces the hot key with its share") {
    val df = ((1 to 900).map(_ => "HOT") ++ (1 to 100).map(_ => "cold")).toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).head
    assert(top.getAs[String]("k") == "HOT")
    assert(math.abs(top.getAs[Double]("share") - 0.9) < 1e-9)
  }
}
