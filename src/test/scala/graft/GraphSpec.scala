package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Graph

/** PageRank semantics on hand graphs with known solutions — the oracle
  * cross-check proves engine==engine; these pin engine==MATH. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("symmetric cycle converges to the uniform distribution") {
    // A -> B -> C -> A: by symmetry the stationary PageRank is exactly
    // 1/3 each, and uniform is the fixed point from the uniform init —
    // every iteration reproduces it, so 10 iterations are exact.
    val links = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val out = Graph.pagerank(links).collect()
    assert(out.length == 3)
    out.foreach { r =>
      // the report rounds at 6 dp, so 1/3 surfaces as 0.333333
      assert(math.abs(r.getAs[Double]("pagerank") - 1.0 / 3) < 1e-6,
        s"cycle node ${r.getString(0)} off uniform: $r")
      assert(r.getAs[Long]("in_links") == 1L && r.getAs[Long]("out_links") == 1L)
    }
  }

  test("star fixture: sources keep only teleport mass; the sink leaks (documented no-dangling-term)") {
    // A -> B, C -> B. A and C have no in-links: rank(A) = rank(C) =
    // 0.15/3 = 0.05 at the fixed point. B: 0.05 + 0.85*(rA + rC) = 0.135.
    // B is a SINK — its mass is not redistributed (Graph.pagerank
    // documents the leak), so the total is 0.235, not 1.0.
    val links = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val out = Graph.pagerank(links).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pagerank")).toMap
    assert(math.abs(out("a") - 0.05) < 1e-6)
    assert(math.abs(out("c") - 0.05) < 1e-6)
    assert(math.abs(out("b") - 0.135) < 1e-4, s"sink rank: ${out("b")}")
  }

  test("out-degree weighting splits a node's vote across its links") {
    // A -> B twice, A -> C once: A's vote splits 2/3 vs 1/3. At the fixed
    // point with B, C sinks: rB = 0.15/3 + 0.85 * rA * 2/3, rA = 0.05.
    val links = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("src", "dst")
    val out = Graph.pagerank(links).collect()
      .map(r => r.getString(0) -> r).toMap
    val rA = 0.15 / 3
    assert(math.abs(out("b").getAs[Double]("pagerank")
      - (0.05 + 0.85 * rA * 2 / 3)) < 1e-6)
    assert(math.abs(out("c").getAs[Double]("pagerank")
      - (0.05 + 0.85 * rA * 1 / 3)) < 1e-6)
    assert(out("a").getAs[Long]("out_links") == 3L)
    assert(out("b").getAs[Long]("in_links") == 2L)
  }
}
