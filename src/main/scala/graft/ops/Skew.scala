package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys.
  *
  * At 100 TB a per-symbol aggregation can meet a dominant key (one ticker
  * = half the volume, one boilerplate document = half the corpus). AQE
  * splits skewed JOIN partitions automatically, but a skewed AGGREGATION
  * key still lands on one task in the partial-agg shuffle when the
  * aggregate has no map-side combine benefit (e.g. exact distincts,
  * collect-style states). The classic fix is salting: two-phase
  * aggregation over (key, salt) then key.
  *
  * Only algebraic aggregates (sum/count/min/max and anything built from
  * them, e.g. avg = sum/count) can be salted this way — order-sensitive
  * or holistic aggregates (exact percentile) cannot.
  */
object Skew {

  /** Salted sum/count aggregation: phase 1 aggregates (key, salt) buckets
    * — spreading a hot key over `saltBuckets` tasks — phase 2 merges per
    * key. Returns one row per key with sum_<col>/cnt columns. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    // deterministic salt from row content, NOT monotonically_increasing_id:
    // a task retry after shuffle-fetch failure can reorder rows, and a
    // nondeterministic salt would double-count/lose rows across the two
    // phases (SPARK-23207 class). Identical rows share a salt — acceptable,
    // they spread across buckets only if the hot key has varied values.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets.toLong)))
    val phase1 = salted.groupBy(col(key), col("__salt")).agg(
      sum(col(valueCol)).as("__psum"),
      count(lit(1)).as("__pcnt"))
    phase1.groupBy(col(key)).agg(
      sum(col("__psum")).as(s"sum_$valueCol"),
      sum(col("__pcnt")).as("cnt"))
      .withColumn(s"avg_$valueCol", col(s"sum_$valueCol") / col("cnt"))
  }

  /** Skew diagnostic: rows per key with share of total — what you run
    * before deciding to salt or to repartition differently. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    // single scan: the total comes from the per-key aggregate, not a second
    // full pass over the fact table
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
    val total = counts.agg(sum(col("rows")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("rows") / col("__total"))
      .drop("__total")
      .orderBy(desc("rows")).limit(topN)
  }
}
