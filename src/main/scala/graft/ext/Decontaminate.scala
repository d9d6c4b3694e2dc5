package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share a word
  * n-gram with any document of a held-out benchmark/eval set — the standard
  * pre-training hygiene step (an eval example leaking into the training
  * corpus inflates downstream scores). The reference has no analog (it is a
  * stock ETL pipeline); this is part of the training-data extension surface
  * next to [[Dedup]] / [[TextOps]].
  *
  * Scale design (the corpus is the 100 TB side, the benchmark the small
  * side):
  *   - n-grams are generated per-row with codegen'd array builtins
  *     (split/sequence/slice/concat_ws) — a linear scan, no UDF, no
  *     shuffle;
  *   - each n-gram is collapsed to its xxhash64 BEFORE the distinct and
  *     the join, so the shuffle and the (optionally broadcast) build side
  *     carry 8-byte keys, never n-word strings (~10x smaller for n=8).
  *     The 8-byte key admits false positives: with B distinct benchmark
  *     n-grams and C distinct corpus n-grams, expected spurious matches
  *     ~= B*C/2^64 — e.g. 10^9 benchmark x 10^13 corpus n-grams (a 100 TB
  *     run) ~= 500 phantom hit-n-grams spread over the whole corpus, noise
  *     for a contamination *filter* (it only ever over-removes a handful
  *     of docs, never under-removes). If exactness ever matters, swap
  *     xxhash64 for a 16-byte md5 prefix (2^128 key space) at 2x key
  *     width; misses are impossible either way — a real shared n-gram
  *     always hashes equal;
  *   - the benchmark side is deduplicated and, by default, broadcast: the
  *     corpus never shuffles at all. For benchmark n-gram sets too big to
  *     broadcast, pass broadcastBenchmark=false for a plain shuffled hash
  *     join on the 8-byte key;
  *   - one LEFT join + one aggregation produces hit and total counts in a
  *     single pass over the corpus n-grams (no second scan for the
  *     denominator).
  */
object Decontaminate {

  /** Exploded distinct (idCol, __g) word-n-gram hashes of `textCol`.
    * Documents shorter than n tokens contribute no rows. */
  private[ext] def ngramHashes(docs: DataFrame, n: Int, idCol: String,
                               textCol: String): DataFrame = {
    require(n >= 1, "n must be >= 1")
    docs
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), explode(expr(
        s"""CASE WHEN size(__w) >= $n
           |THEN transform(sequence(1, size(__w) - ${n - 1}),
           |               i -> concat_ws(' ', slice(__w, i, $n)))
           |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("__ng"))
      .select(col(idCol), xxhash64(col("__ng")).as("__g"))
      .distinct()
  }

  /** Per-document contamination report: for every corpus document sharing
    * >= 1 word n-gram with the benchmark set, the distinct shared-n-gram
    * count (`hit_ngrams`), the document's distinct n-gram count
    * (`n_ngrams`), and their ratio (`hit_frac`, tie-safe-rounded to 6).
    * Clean documents are omitted; `corpus.join(result, "left_anti")` is the
    * decontaminated corpus. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int,
                    idCol: String = "doc_id", textCol: String = "text",
                    broadcastBenchmark: Boolean = true): DataFrame = {
    val bench0 = ngramHashes(benchmark, n, idCol, textCol)
      .select(col("__g")).distinct().withColumn("__hit", lit(1))
    val bench = if (broadcastBenchmark) broadcast(bench0) else bench0
    ngramHashes(corpus, n, idCol, textCol)
      .join(bench, Seq("__g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_ngrams"), count(col("__hit")).as("hit_ngrams"))
      .filter(col("hit_ngrams") > 0)
      .withColumn("hit_frac",
        graft.ops.Num.cround(col("hit_ngrams").cast("double") / col("n_ngrams"), 6))
      .select(col(idCol), col("hit_ngrams"), col("n_ngrams"), col("hit_frac"))
  }
}
