package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query has matching oracle aliases and
  * the flagship entry produces rows. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("queries and oracle SQL keys match exactly") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.diff(q).isEmpty, s"oracle keys without query impl: ${o.diff(q)}")
    assert(q.diff(o).isEmpty, s"queries missing oracle SQL: ${q.diff(o)}")
  }

  test("query id prefixes are unique (bench JSON key contract)") {
    // Bench compacts each query name to its id prefix (before the first
    // '_') in the reporting JSON; a collision would silently merge two
    // queries' timings in the driver's BENCH file.
    val byPrefix = SparkEntry.queries.keySet.groupBy(_.takeWhile(_ != '_'))
    val dups = byPrefix.filter(_._2.size > 1)
    assert(dups.isEmpty, s"colliding bench key prefixes: $dups")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }

  test("all queries run on sf0.001 and return rows") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }
}
