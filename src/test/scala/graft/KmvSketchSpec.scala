package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Semantics of the native bounded kmv_sketch distinct-count aggregate. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.register(SparkTestSession.spark); SparkTestSession.spark }

  /** (n_kept, kth) per group, partials forced to merge across 8 partitions. */
  private def sketch(rows: Seq[(String, Long)], k: Int): Map[String, (Int, Option[Long])] = {
    import spark.implicits._
    rows.toDF("g", "h")
      .repartition(8)
      .groupBy("g").agg(expr(s"kmv_sketch(h, $k)").as("sk"))
      .select(col("g"), col("sk.n_kept"), col("sk.kth"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
  }

  test("under k the sketch is the exact distinct-hash count") {
    val rows = Seq(("a", 5L), ("a", 5L), ("a", 9L), ("a", 1L), ("b", 7L))
    val out = sketch(rows, 10)
    assert(out("a") == ((3, Some(9L))), "duplicates must not inflate n_kept")
    assert(out("b") == ((1, Some(7L))))
  }

  test("saturated sketch keeps exactly the k smallest distinct hashes") {
    // 100 distinct hashes in a scrambled order; k=16 must report the 16th
    // smallest as kth regardless of partitioning/merge order
    val hs = (0L until 100L).map(i => (i * 37L) % 101L)
    val expectKth = hs.distinct.sorted.apply(15)
    val out = sketch(hs.map(("g", _)), 16)
    assert(out("g") == ((16, Some(expectKth))))
  }

  test("merge order cannot change the result (same data, different partitioning)") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => ("g", (i * 7919L) % 4096L))
    val runs = Seq(1, 3, 8).map { p =>
      rows.toDF("g", "h").repartition(p)
        .groupBy("g").agg(expr("kmv_sketch(h, 32)").as("sk"))
        .select("sk.n_kept", "sk.kth").collect().head
    }
    assert(runs.distinct.size == 1, s"partitioning changed the sketch: $runs")
  }

  test("null hashes are ignored; empty group yields (0, null)") {
    import spark.implicits._
    val out = Seq(("g", Some(4L)), ("g", None), ("e", None))
      .toDF("g", "h")
      .groupBy("g").agg(expr("kmv_sketch(h, 8)").as("sk"))
      .select(col("g"), col("sk.n_kept"), col("sk.kth"))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out("g") == ((1, Some(4L))))
    assert(out("e") == ((0, None)))
  }

  test("estimator accuracy on the canonical md5-prefix hash (~11% at k=64)") {
    import spark.implicits._
    // 5000 distinct keys through the repo's md5-prefix hash: the KMV
    // estimate must land within 3 standard errors (3/sqrt(k-2) ~ 38%)
    // and, on this fixed input, well inside the nominal band.
    val n = 5000
    val est = (0 until n).map(i => ("g", s"key$i")).toDF("g", "s")
      .withColumn("h",
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .groupBy("g").agg(expr("kmv_sketch(h, 64)").as("sk"))
      .select(lit(63.0) * lit(4294967296.0) / col("sk.kth"))
      .as[Double].head()
    assert(math.abs(est - n) / n < 0.38, s"estimate $est too far from $n")
  }
}
