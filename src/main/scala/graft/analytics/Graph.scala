package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize
import graft.ops.Num

/** Graph analytics over edge lists distilled from a corpus-sized table.
  *
  * The division of labor the 100 TB design wants: the CORPUS pays exactly
  * one edge-count aggregate (linear, map-side combined); every iteration
  * then runs on the aggregated graph. [[pagerank]] keeps the distributed
  * join form — a general graph's node set is NOT bounded (contrast
  * [[Transitions.stationaryDistribution]], whose (event types)² kernel
  * collapses to one row of arrays) — but broadcasts the rank vector into
  * each step, so a bounded graph costs constant stage overhead and a huge
  * one degrades to shuffle joins without a code change. */
object Graph {

  /** PageRank over a (src, dst) link table: damping 0.85, `iters` power
    * iterations, edge weights by out-link counts. Per-iteration incoming
    * sums round tie-safe at 12 so cross-engine summation ulps can't
    * compound (the oracle unrolls the identical iterations); the report
    * rounds at 6. No dangling-mass redistribution: a sink node keeps its
    * teleport share and leaks the rest — documented, and pinned by
    * GraphSpec's star fixture. */
  def pagerank(links: DataFrame, iters: Int = 10): DataFrame =
    fromEdgeCounts(links.groupBy("src", "dst")
      .agg(count(lit(1)).as("cnt")), iters)

  /** [[pagerank]] over an ALREADY-AGGREGATED (src, dst, cnt) edge-count
    * table — the kernel the streaming twin shares verbatim: a streamed
    * incremental edge-count aggregate (update-mode groupBy state) snapshots
    * to exactly this shape, so stream == batch reduces to the aggregate
    * equality the StreamingSpec harness proves (the ev20 composition
    * pattern). */
  def fromEdgeCounts(edgeCounts: DataFrame, iters: Int = 10): DataFrame = {
    val edges = Materialize(edgeCounts)
    val outCnt = edges.groupBy("src").agg(sum("cnt").as("out_cnt"))
    val ew = Materialize(edges.join(outCnt, "src")
      .select(col("src"), col("dst"),
        (col("cnt").cast("double") / col("out_cnt")).as("w")))
    val nodes = Materialize(edges.select(col("src").as("host"))
      .union(edges.select(col("dst"))).distinct())
    val nn = nodes.agg(count(lit(1)).as("__n"))
    var rank = nodes.crossJoin(broadcast(nn))
      .select(col("host"), (lit(1.0) / col("__n")).as("r"))
    // broadcast the vector into each step: the per-iteration cost is pure
    // stage overhead on constant-size frames — a shuffle join would double
    // the stages for node-count-sized inputs
    for (_ <- 1 to iters) {
      val contrib = ew.join(broadcast(rank.withColumnRenamed("host", "src")),
          "src")
        .groupBy(col("dst")).agg(sum(col("r") * col("w")).as("s"))
        .withColumnRenamed("dst", "host")
      rank = nodes.join(broadcast(contrib), Seq("host"), "left")
        .crossJoin(broadcast(nn))
        .select(col("host"), Num.cround(
          lit(0.15) / col("__n") + lit(0.85) * coalesce(col("s"), lit(0.0)),
          12).as("r"))
    }
    val inCnt = edges.groupBy(col("dst").as("host"))
      .agg(sum("cnt").as("in_links"))
    rank
      .join(inCnt, Seq("host"), "left")
      .join(outCnt.withColumnRenamed("src", "host")
        .withColumnRenamed("out_cnt", "out_links"), Seq("host"), "left")
      .select(col("host"), Num.cround(col("r"), 6).as("pagerank"),
        coalesce(col("in_links"), lit(0L)).as("in_links"),
        coalesce(col("out_links"), lit(0L)).as("out_links"))
      .orderBy("host")
  }
}
