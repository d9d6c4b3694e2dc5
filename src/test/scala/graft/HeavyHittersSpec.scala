package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Misra-Gries sketch aggregate: exact below capacity, bounded error above. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.register(SparkTestSession.spark); SparkTestSession.spark }
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(expr(s"heavy_hitters(k, $cap)").as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.min_count")
      .as[(String, Long)].collect().toMap

  test("capacity >= distinct keys: counts are exact across partitions") {
    val rows = (1 to 500).map(_ => "a") ++ (1 to 300).map(_ => "b") ++
      (1 to 7).map(_ => "c") ++ Seq(null.asInstanceOf[String])
    val df = rows.toDF("k").repartition(16)
    assert(summarize(df, 8) == Map("a" -> 500L, "b" -> 300L, "c" -> 7L))
  }

  test("above capacity: every key with freq > n/capacity survives, counts undercount by <= n/capacity") {
    // n = 1000; capacity 5 -> guarantee threshold n/cap = 200
    val rows = (1 to 400).map(_ => "hot1") ++ (1 to 300).map(_ => "hot2") ++
      (1 to 300).map(i => s"noise${i % 100}")
    val df = rows.toDF("k").repartition(16)
    val hh = summarize(df, 5)
    assert(hh.size <= 5)
    assert(hh.contains("hot1") && hh.contains("hot2"), s"guaranteed keys missing: $hh")
    assert(hh("hot1") <= 400 && hh("hot1") >= 400 - 200, s"hot1 bound: $hh")
    assert(hh("hot2") <= 300 && hh("hot2") >= 300 - 200, s"hot2 bound: $hh")
  }

  test("result is sorted by count desc then item asc; grouped aggregation works") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "k").repartition(4)
    val out = df.groupBy("g").agg(expr("heavy_hitters(k, 4)").as("hh"))
      .orderBy("g")
      .as[(String, Seq[(String, Long)])].collect()
    assert(out.toSeq == Seq(
      ("g1", Seq(("x", 2L), ("y", 1L))),
      ("g2", Seq(("z", 1L)))))
  }

  test("exact regime equals groupBy-count on random data (fixed seed, many partitions)") {
    val rnd = new scala.util.Random(9090)
    for (_ <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(12)
      val rows = Seq.fill(500)(s"k${rnd.nextInt(nKeys)}")
      val df = rows.toDF("k").repartition(1 + rnd.nextInt(16))
      val expected = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(summarize(df, 16) == expected, s"nKeys=$nKeys")
    }
  }

  test("GraftExtensions injects the native functions at session build time") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force base session init first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session on the SAME SparkContext, functions injected via the
      // extensions hook rather than imperative registration
      val injected = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(injected ne base)
      val hh = injected.sql(
        "SELECT heavy_hitters(x, 4) AS hh FROM VALUES ('a'),('a'),('b') AS t(x)")
        .selectExpr("hh[0].item", "hh[0].min_count")
        .collect().head
      assert(hh.getString(0) == "a" && hh.getLong(1) == 2L)
      val cs = injected.sql(
        "SELECT cosine_similarity(array(3.0D, 0D), array(9.0D, 0D)) AS c")
        .collect().head.getDouble(0)
      assert(math.abs(cs - 1.0) < 1e-12)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("partial aggregation stays enabled (map-side combine before the shuffle)") {
    val df = (1 to 100).map(i => s"k${i % 3}").toDF("k").repartition(8)
    val plan = df.groupBy().agg(expr("heavy_hitters(k, 8)"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate (or SortAggregate fallback) must appear twice:
    // partial_heavy_hitters before the exchange, the final after
    assert(plan.contains("partial_heavy_hitters") || plan.contains("partial heavy_hitters")
      || "(?s)Aggregate.*Exchange.*Aggregate".r.findFirstIn(plan).isDefined,
      s"no partial aggregation in plan:\n$plan")
  }
}
