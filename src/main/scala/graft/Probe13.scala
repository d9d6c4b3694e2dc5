package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the r13 optimization round: times the internal
  * stages of the ingest queries at a given SF. Dev-only, not part of the
  * driver contract. */
object Probe13 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup
    Queries.all("a1_count")(spark, sfDir).write.format("noop").mode("overwrite").save()

    // ---- sim24 stages ----
    {
      import graft.ext.{IncrementalAnnIndex => I, Similarity}
      import graft.ops.Materialize
      val emb = io.Sources.embeddings(spark, sfDir)
      val mx = t("sim24: mx materialize")(Materialize(emb.agg(
        (floor(max("vec_id") / 3) + 1).as("__w"))))
      def slice(i: Int): DataFrame =
        emb.crossJoin(broadcast(mx))
          .filter(floor(col("vec_id") / col("__w")) === i)
          .drop("__w")
      var st = I.init(spark, emb)
      for (i <- 0 until 3)
        st = t(s"sim24: ingestBatch $i")(
          I.ingestBatch(st, slice(i), Similarity.planes(spark)))
      val snap = t("sim24: snapshotSearch build")(
        I.snapshotSearch(st).orderBy("query_id", "rank"))
      t("sim24: snapshot noop")(
        snap.write.format("noop").mode("overwrite").save())

      // fine-grained replay of batch 1 internals
      {
        import graft.ops.Materialize.MaterializeOps
        import org.apache.spark.sql.expressions.Window
        var s0 = I.init(spark, emb)
        s0 = I.ingestBatch(s0, slice(0), Similarity.planes(spark))
        val batch = slice(1)
        val n = t("s24b1: count")(batch.count())
        val fresh = t("s24b1: fresh mat")(batch
          .join(s0.vectors.select("vec_id"), Seq("vec_id"), "left_anti")
          .materialized)
        val freshLsh = Similarity.lshBuckets(fresh, Similarity.planes(spark), 8)
        val wBest = Window.partitionBy("vec_id").orderBy(desc("score"), col("c"))
        val freshIvf = Similarity.anchorScores(fresh, Similarity.ivfAnchors(spark))
          .withColumn("__rnk", row_number().over(wBest))
          .filter(col("__rnk") === 1)
          .select(col("vec_id"), col("c").as("bucket"))
        // admit is private; inline the same logic
        def admit(existing: DataFrame, incoming: DataFrame): DataFrame = {
          val occ = existing.groupBy("bucket").agg(count(lit(1)).as("__occ"))
          val wB = Window.partitionBy("bucket").orderBy("vec_id")
          incoming.join(occ, Seq("bucket"), "left")
            .na.fill(0L, Seq("__occ"))
            .withColumn("__rn", row_number().over(wB))
            .filter(col("__rn") + col("__occ") <= 64)
            .select("vec_id", "bucket")
        }
        val newLsh = t("s24b1: newLsh mat")(admit(s0.lshCapped, freshLsh).materialized)
        val newIvf = t("s24b1: newIvf mat")(admit(s0.ivfCapped, freshIvf).materialized)
        def newPairs(old: DataFrame, neu: DataFrame): DataFrame = {
          val all = old.unionByName(neu)
          neu.select(col("vec_id").as("src"), col("bucket"))
            .join(all.select(col("vec_id").as("dst"), col("bucket")), Seq("bucket"))
            .unionByName(all.select(col("vec_id").as("src"), col("bucket"))
              .join(neu.select(col("vec_id").as("dst"), col("bucket")), Seq("bucket")))
            .filter(col("src") =!= col("dst"))
            .select("src", "dst")
        }
        val pairs = newPairs(s0.lshCapped, newLsh)
          .unionByName(newPairs(s0.ivfCapped, newIvf))
          .distinct()
        val pairsM = t("s24b1: pairs mat")(pairs.materialized)
        println(s"[probe] s24b1: n=$n pairs=${pairsM.count()} edges0=${s0.edges.count()}")
        val allVectors = s0.vectors.unionByName(fresh)
        val scored = Similarity.scorePairs(Similarity.withDoubles(allVectors), pairsM)
        val scoredM = t("s24b1: scored mat")(scored.materialized)
        t("s24b1: edges fold mat")(
          Similarity.topMEdges(s0.edges.unionByName(scoredM).distinct(), 8).materialized)
      }
    }

    // ---- sim21 stages ----
    {
      import graft.ext.Similarity
      import graft.ops.Materialize
      val emb = t("sim21: emb mat")(Materialize(io.Sources.embeddings(spark, sfDir)))
      val cap = 2000L
      val anchors = Similarity.ivfAnchors(spark)
      val (assigned, probes) = Similarity.ivfRoute(emb, anchors, queryCap = cap)
      val routing = t("sim21: routing mats")(
        Some((Materialize(assigned), Materialize(probes))))
      val truth = t("sim21: truth mat")(Materialize(
        Similarity.bruteForceTopK(emb, queryCap = cap)
          .select("query_id", "vec_id")))
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      t("sim21: fixed stack")(noop(
        Similarity.ivfPqTopKRerank(emb, anchors, Similarity.pqCodebook(spark),
          queryCap = cap, routingOpt = routing)))
      t("sim21: learned train+stack")(noop(
        Similarity.ivfPqTopKRerank(emb, anchors, Similarity.learnPqCodebook(emb),
          queryCap = cap, routingOpt = routing)))
      t("sim21: residual train+stack")(noop(
        Similarity.ivfPqResidualTopKRerank(emb, anchors,
          queryCap = cap, routingOpt = routing)))
      t("sim21: truth scan noop")(noop(truth))
    }

    // ---- d15 stages ----
    {
      import graft.ext.{IncrementalCuration => C, CorpusPipeline, Dedup}
      import graft.ops.Materialize
      val docs = io.Sources.documents(spark, sfDir)
      val cfg = CorpusPipeline.CurationConfig(redact = false)
      val mx = t("d15: mx materialize")(Materialize(docs.agg(
        (floor(max("doc_id") / 3) + 1).as("__w"))))
      def slice(i: Int): DataFrame =
        docs.crossJoin(broadcast(mx))
          .filter(floor(col("doc_id") / col("__w")) === i)
          .drop("__w")
      var st = C.init(spark, docs, cfg.nHashes)
      for (i <- 0 until 3)
        st = t(s"d15: ingestBatch $i")(C.ingestBatch(st, slice(i), cfg))

      // fine-grained replay of one mid-stream batch (fresh state, batch 1)
      {
        import graft.ops.Materialize.MaterializeOps
        import org.apache.spark.sql.expressions.Window
        var s0 = C.init(spark, docs, cfg.nHashes)
        s0 = C.ingestBatch(s0, slice(0), cfg)
        val batch = slice(1)
        val n = t("d15b1: count")(batch.count())
        val fresh = t("d15b1: fresh mat")(
          Dedup.keepFirstPerDigest(batch)
            .withColumn("__digest", md5(col("text")))
            .join(s0.digests, Seq("__digest"), "left_anti").materialized)
        val freshDocs = fresh.drop("__digest")
        val freshSigs = t("d15b1: freshSigs mat")(
          Dedup.minhashSignatures(freshDocs, cfg.nHashes).materialized)
        val allSigs = s0.signatures.unionByName(freshSigs)
        val bandsM = classOf[C.CurationState] // placeholder, bands is private
        def bands(sig: DataFrame): DataFrame = {
          val stackArgs = (0 until cfg.nBands)
            .map(b => s"$b, concat(CAST(mh_${2 * b} AS STRING), '_', CAST(mh_${2 * b + 1} AS STRING))")
            .mkString(", ")
          sig.selectExpr("doc_id",
            s"stack(${cfg.nBands}, $stackArgs) as (band, band_value)")
        }
        val freshBands = bands(freshSigs)
        val probed = freshBands.select("band", "band_value").distinct()
        val cappedAll = bands(allSigs)
          .join(probed, Seq("band", "band_value"), "left_semi")
          .withColumn("__bn", row_number().over(
            Window.partitionBy("band", "band_value").orderBy("doc_id")))
          .filter(col("__bn") <= Dedup.DefaultMaxPerBucket).drop("__bn")
        val candidates = freshBands.as("a")
          .join(cappedAll.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_value") === col("b.band_value") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .distinct()
        val allDocs = s0.docs.unionByName(freshDocs)
        val newEdges = t("d15b1: newEdges mat")(
          Dedup.jaccardVerifyPairs(allDocs, candidates, cfg.minJaccard)
            .select("doc_a", "doc_b").materialized)
        val isE = t("d15b1: isEmpty")(newEdges.isEmpty)
        if (!isE) {
          val labelEdges = s0.labels
            .filter(col("doc_id") =!= col("cluster_rep"))
            .select(col("doc_id").as("doc_a"), col("cluster_rep").as("doc_b"))
          t("d15b1: duplicateClusters")(
            Dedup.duplicateClusters(labelEdges.unionByName(newEdges)))
        }
        println(s"[probe] d15b1: n=$n newEdges=${newEdges.count()}")
      }
      val out = Dedup.dedupByClusters(st.docs, st.labels)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
      t("d15: snapshot noop")(
        out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
