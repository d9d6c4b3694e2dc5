package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only ANN quality probe (round-8 verdict item #3): put a NUMBER on
  * every approximate top-k path's recall against the sim1 brute-force
  * truth, and sweep the learned-IVF knobs to settle whether distributed
  * k-means buys recall on this corpus or only costs code.
  *
  * recall@k = |approx ∩ truth| / |truth| summed over the query set, with
  * truth = [[ext.Similarity.bruteForceTopK]] at the same (queryMod, k).
  * Computed with a join + one aggregate — no per-row driver collects; the
  * single `.first()` pulls the one-row (hits, total) scalar per config
  * (same dev-tool scalar-pull pattern as ScalingProbe).
  *
  * Usage: runMain graft.RecallProbe [sfDir] (default the driver's sf0.1)
  * Prints a markdown table for COVERAGE.md.
  */
object RecallProbe {

  /** recall of `approx` against `truth`, both (query_id, vec_id[, ...]). */
  def recall(approx: DataFrame, truth: DataFrame): Double = {
    val t = truth.select(col("query_id"), col("vec_id"))
    val hit = approx.select(col("query_id"), col("vec_id"))
      .join(t, Seq("query_id", "vec_id"), "inner")
    val r = t.agg(count(lit(1))).first().getLong(0)
    if (r == 0) 0.0 else hit.agg(count(lit(1))).first().getLong(0).toDouble / r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import ext.Similarity

    val emb = io.Sources.embeddings(spark, dir).localCheckpoint(true)
    val (qm, k) = (100, 5)
    val truth = Similarity.bruteForceTopK(emb, queryMod = qm, k = k)
      .localCheckpoint(true)
    val nq = truth.select("query_id").distinct().count()
    println(s"corpus=$dir vectors=${emb.count()} queries=$nq k=$k")
    println("| path | config | recall@5 |")
    println("|---|---|---|")
    def row(path: String, config: String, r: Double): Unit =
      println(f"| $path | $config | $r%.3f |")

    // sim2: hyperplane-LSH bucketed top-k (registered config nPlanes=8)
    for (nPlanes <- Seq(4, 6, 8)) {
      val r = recall(Similarity.lshTopK(emb,
        Similarity.planes(spark, nPlanes = nPlanes), queryMod = qm, k = k,
        nPlanes = nPlanes), truth)
      row("sim2 lsh", s"nPlanes=$nPlanes (2^$nPlanes buckets)", r)
    }

    // sim6: multi-probe over the registered 256-bucket config — recall
    // recovered per extra probed bucket at (probes+1)x candidate cost
    for (probes <- Seq(1, 2, 4, 8)) {
      val r = recall(Similarity.lshTopKMultiProbe(emb,
        Similarity.planes(spark), queryMod = qm, k = k, probes = probes),
        truth)
      row("sim6 multiprobe", s"nPlanes=8 probes=$probes", r)
    }

    // sim3: IVF fixed codebook — nprobe/nLists sweep
    for (nLists <- Seq(16, 32); nprobe <- Seq(1, 2, 4)) {
      val r = recall(Similarity.ivfTopK(emb,
        Similarity.ivfAnchors(spark, nLists = nLists), queryMod = qm, k = k,
        nprobe = nprobe), truth)
      row("sim3 ivf fixed", s"nLists=$nLists nprobe=$nprobe", r)
    }

    // sim3: learned codebook — iterations sweep at the registered shape
    for (nLists <- Seq(16, 32); iters <- Seq(1, 3, 6)) {
      val r = recall(Similarity.ivfTopK(emb,
        Similarity.learnIvfAnchors(emb, nLists = nLists, iters = iters),
        queryMod = qm, k = k, nprobe = 2), truth)
      row("sim3 ivf learned", s"nLists=$nLists iters=$iters nprobe=2", r)
    }

    // sim5: prefix-rerank — shortlist depth sweep (stage-2 rerank is exact,
    // so recall == shortlist's coverage of the true top-k)
    for (shortlist <- Seq(5, 10, 20, 50, 100)) {
      val r = recall(Similarity.prefixRerankTopK(emb, pdims = 16,
        shortlist = shortlist, queryMod = qm, k = k), truth)
      row("sim5 prefix-rerank", s"pdims=16 shortlist=$shortlist", r)
    }

    // sim7: PQ/ADC — quantization-distortion recall at the registered
    // shape (ADC ranks by L2 over a random codebook, truth is cosine over
    // raw floats: both the metric mismatch and the unlearned codebook cost
    // recall; production pairs ADC with k-means codebooks + a rerank tier)
    row("sim7 pq adc", "nSub=8 nCentroids=16",
      recall(Similarity.pqTopK(emb, Similarity.pqCodebook(spark),
        queryMod = qm, k = k), truth))

    // sim8: IVF routing x PQ distance — recall compounds both
    // approximations (on this corpus both are near-floor; the composed
    // MECHANISM is what the oracle + driver-side recomputation pin)
    row("sim8 ivf-pq", "nLists=16 nprobe=2 nSub=8",
      recall(Similarity.ivfPqTopK(emb, Similarity.ivfAnchors(spark),
        Similarity.pqCodebook(spark), queryMod = qm, k = k), truth))
    spark.stop()
  }
}
