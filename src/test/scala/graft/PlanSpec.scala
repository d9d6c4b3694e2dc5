package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale properties ARCHITECTURE.md
  * claims must stay visible in the executed plan. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.all(name)(spark, dir).queryExecution.executedPlan.toString

  test("pipeline derives all features over a single symbol exchange") {
    val p = plan("pipeline_features")
    val symbolExchanges = "hashpartitioning\\(symbol".r.findAllIn(p).length
    assert(symbolExchanges == 1,
      s"expected exactly one symbol hash exchange, got $symbolExchanges")
  }

  test("dimension joins broadcast the small side") {
    val p = plan("j1_join_dims")
    assert(p.contains("BroadcastHashJoin"), "nation/region should broadcast")
  }

  test("sort+limit plans as top-k, not a full sort") {
    val p = plan("o3_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), "LIMIT should become top-k")
  }

  test("narrow projection prunes the parquet read schema") {
    val p = Queries.all("u2_distinct")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_partkey:bigint>"),
      "distinct symbols should read only l_partkey")
  }

  test("brute-force ANN broadcasts the query side (corpus is never shuffled)") {
    val p = plan("sim1_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }
}
