package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the structurally interesting
  * queries, to audit shuffle/codegen structure (`sbt "runMain graft.Explain
  * [sfDir] [out.md]"`). Not part of the driver contract. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/plans.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq("pipeline_features", "j1_join_dims", "s4_scan_limit",
      "d2_minhash_lsh", "sim1_cosine_topk", "x7_predictions",
      "j5_asof_join", "j6_range_join", "a12_heavy_hitters",
      "t6_pack_sequences", "d7_keep_first",
      "c1_decontam", "t8_repetition", "t11_vocab", "t12_tfidf",
      "st3_interval_join", "t13_unigram", "e1_centroids", "ev1_funnel",
      "e2_rocchio", "x12_pivot", "t14_best_src", "c2_embed_decontam",
      "j7_cube", "j8_full_outer", "w11_range_mean", "u4_intersect",
      "t15_chunks", "o7_paginate", "sim4_quantize", "m2_phash_pairs",
      "t16_span_dedup", "t17_temp_mix",
      "d8_verified_pairs", "d9_semantic_clusters", "ev2_funnel_salted",
      "sim5_prefix_rerank", "t18_strat_sample",
      "sim6_lsh_multiprobe", "sim7_pq_topk", "e3_hard_negatives",
      "ev4_funnel_adaptive", "ev5_retention", "ev6_transitions",
      "ev7_session_paths", "ev8_volume_anomaly", "a14_kmv_distinct",
      "a15_binned_quantiles", "w14_macd", "f9_winsorize", "t21_normalize",
      "t23_weighted_sample", "o8_keyset_page")
    val sb = new StringBuilder("# Physical plans (formatted)\n")
    interesting.foreach { name =>
      val plan = Queries.all(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n```\n$plan\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
