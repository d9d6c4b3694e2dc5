package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Semantics of the native bounded top_k_by aggregate. */
class TopKByScoreSpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.register(SparkTestSession.spark); SparkTestSession.spark }

  private def topk(rows: Seq[(String, Long, Double)], k: Int): Map[String, Seq[(Long, Double)]] = {
    import spark.implicits._
    rows.toDF("g", "id", "score")
      // force many partitions so partial buffers MERGE, not just update
      .repartition(8)
      .groupBy("g").agg(expr(s"top_k_by(score, id, $k)").as("tk"))
      .collect()
      .map(r => r.getAs[String]("g") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getLong(0), t.getDouble(1))))
      .toMap
  }

  test("keeps the k best per group, best-first, ties to the smaller id") {
    val rows = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.5), ("a", 3L, 0.7), ("a", 4L, 0.7),
      ("b", 10L, 0.1))
    val out = topk(rows, 2)
    assert(out("a") == Seq((1L, 0.9), (3L, 0.7)),
      "tie at 0.7 must keep the smaller id (3 beats 4)")
    assert(out("b") == Seq((10L, 0.1)), "groups under k keep everything")
  }

  test("bounded merge across partitions is exact for every k") {
    // 100 scored rows in one group over 8 partitions: result must equal
    // the brute-force sort regardless of how partials merged
    val rows = (0L until 100L).map(i => ("g", i, ((i * 37) % 100) / 100.0))
    val expect = rows.sortBy { case (_, id, s) => (-s, id) }
      .take(7).map { case (_, id, s) => (id, s) }
    assert(topk(rows, 7)("g") == expect)
  }

  test("randomized equivalence with the brute-force sort, ties exercised") {
    // 500 rows, 7 groups, only 50 distinct scores -> heavy ties; the
    // aggregate must equal the (score desc, id asc) sort's prefix for
    // every group under any partial-merge order. Seeded = reproducible.
    val rnd = new scala.util.Random(42)
    val rows = (0L until 500L).map(i =>
      (s"g${rnd.nextInt(7)}", i, rnd.nextInt(50) / 10.0))
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy { case (_, id, s) => (-s, id) }
        .take(9).map { case (_, id, s) => (id, s) }
    }
    assert(topk(rows, 9) == expected)
  }

  test("null and NaN scores are ignored") {
    import spark.implicits._
    val out = Seq(("g", 1L, Some(0.5)), ("g", 2L, None))
      .toDF("g", "id", "score")
      .withColumn("score",
        when(col("id") === 2L, lit(Double.NaN)).otherwise(col("score")))
      .groupBy("g").agg(expr("top_k_by(score, id, 5)").as("tk"))
      .select(expr("size(tk)")).head().getInt(0)
    assert(out == 1, "NaN-scored row must not be kept")
  }
}
