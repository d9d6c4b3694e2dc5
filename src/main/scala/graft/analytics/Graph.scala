package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Connected components over an edge list, by iterative min-label
    * propagation: every node starts labeled with itself; each round every
    * node takes the LEAST of its own label and its neighbors' labels
    * (edges symmetrized, so propagation is undirected). After `iters`
    * rounds every node within distance `iters` of its component's
    * lexicographic-minimum node carries that minimum — `iters` must be
    * >= the graph diameter for full convergence (the caller's contract;
    * extra rounds are exact no-ops, so a generous bound is safe, and each
    * round costs one stage on the AGGREGATED graph, never the corpus).
    *
    * Same division of labor as [[pagerank]]: distill the corpus to a
    * distinct edge set once, then iterate with the label frame broadcast
    * into each step. Labels are exact strings — no floating point
    * anywhere, so cross-engine equality is structural. This is the
    * general-graph sibling of [[graft.ext.Dedup]]'s bounded-round
    * min-label clustering over LSH candidate pairs. */
  def connectedComponents(links: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // und feeds TWO materializations (nodes, undSelf) and references the
    // corpus-sized links twice itself — checkpoint it once so the corpus
    // pays one distill pass, not four scans across the two jobs
    val und = Materialize(
      links.select(col("src").as("a"), col("dst").as("b"))
        .union(links.select(col("dst"), col("src")))
        .filter(col("a") =!= col("b"))
        .distinct())
    val nodes = Materialize(und.select(col("a").as("host")).distinct())
    // self-loops fold the keep-own-label branch into the same MIN as the
    // neighbor labels, so every round references the label frame exactly
    // ONCE — double-referencing it (neighbor join + coalesce join) doubles
    // the logical plan per round and the optimizer chokes on 2^iters
    // (measured: 10 rounds never finished analysis)
    val undSelf = Materialize(und.union(
      nodes.select(col("host").as("a"), col("host").as("b"))))
    var lbl = nodes.select(col("host"), col("host").as("comp"))
    for (_ <- 1 to iters) {
      lbl = undSelf
        .join(broadcast(lbl.withColumnRenamed("host", "a")), "a")
        .groupBy(col("b").as("host")).agg(min("comp").as("comp"))
    }
    val folded = Materialize(lbl)
    val sizes = folded.groupBy("comp").agg(count(lit(1)).as("component_size"))
    folded.join(broadcast(sizes), "comp")
      .select(col("host"), col("comp").as("component"), col("component_size"))
      .orderBy("host")
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED distinct
    * edge set: `iters` mutual-reinforcement rounds — authority(v) =
    * Σ_{u→v} hub(u), then hub(u) = Σ_{u→v} authority(v) — each half
    * L1-normalized so scores sum to 1 (the SQL-friendly normalization: no
    * sqrt, and relative ranking is what the hub/authority read is for).
    * Per-half incoming sums and the normalized ratios round tie-safe at
    * 12 (the [[pagerank]] cross-engine lockstep contract — the oracle
    * unrolls identical iterations); the report rounds at 6.
    *
    * Shape: the corpus pays one distinct-edge aggregate; each round is
    * two broadcast joins + two tiny aggregates over the bounded graph —
    * constant stage overhead, like [[pagerank]]'s loop. Nodes with no
    * in-links hold authority 0; no out-links, hub 0. */
  def hits(links: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val edges = Materialize(
      links.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    val nodes = Materialize(edges.select(col("src").as("host"))
      .union(edges.select(col("dst"))).distinct())
    val nn = nodes.agg(count(lit(1)).as("__n"))
    // uniform init over the node set: h0 sums to 1 by construction
    var hub = nodes.crossJoin(broadcast(nn))
      .select(col("host"), (lit(1.0) / col("__n")).as("h"))
    var auth: DataFrame = null
    // global window over the BOUNDED node frame, so normalization
    // references its input exactly once — a total-aggregate cross join
    // would double the logical plan per half-round (2^(2*iters): the
    // connectedComponents lesson)
    val all = Window.partitionBy()
    def l1Normalize(raw: DataFrame, c: String): DataFrame =
      raw.select(col("host"), Num.cround(
        col(c) / Num.cround(sum(c).over(all), 12), 12).as(c))
    for (_ <- 1 to iters) {
      val aRaw = edges
        .join(broadcast(hub.withColumnRenamed("host", "src")), "src")
        .groupBy(col("dst").as("host"))
        .agg(Num.cround(sum("h"), 12).as("a"))
      // one materialization per FULL round, not per half: the auth half is
      // referenced exactly once by the hub half (broadcast build side), so
      // it rides the hub job lazily — plan depth per job stays one round
      // (shallow, the property the half-round split bought at 13 s -> 2.8 s)
      // with HALF the blocking jobs
      auth = l1Normalize(
        nodes.join(broadcast(aRaw), Seq("host"), "left")
          .select(col("host"), coalesce(col("a"), lit(0.0)).as("a")), "a")
      val hRaw = edges
        .join(broadcast(auth.withColumnRenamed("host", "dst")), "dst")
        .groupBy(col("src").as("host"))
        .agg(Num.cround(sum("a"), 12).as("h"))
      hub = Materialize(l1Normalize(
        nodes.join(broadcast(hRaw), Seq("host"), "left")
          .select(col("host"), coalesce(col("h"), lit(0.0)).as("h")), "h"))
    }
    // the final report reads the last auth half-round; checkpoint it once
    // so the output join doesn't recompute it from the hub checkpoint
    auth = Materialize(auth)
    hub.join(broadcast(auth), "host")
      .select(col("host"), Num.cround(col("h"), 6).as("hub"),
        Num.cround(col("a"), 6).as("authority"))
      .orderBy("host")
  }
}
