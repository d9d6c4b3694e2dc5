package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram (fixed-bin) quantile estimation — the mergeable scale path
  * for per-group quantiles that `Derive.volumeQuartiles` documents as the
  * "swap at very large key counts" alternative to exact `percentile`
  * (SURVEY §7.4 trap #4 note). Exact per-group percentile materializes
  * and sorts every value of a group; `approx_percentile` fixes the cost
  * but its KLL-style sketch is engine-private — useless under this repo's
  * cross-engine hash gate. A fixed-bin histogram is both: constant state
  * (`bins` longs per group), mergeable (bin counts add), and a pure
  * function of the data — DuckDB reproduces it bit-for-bit.
  *
  * Plan shape (the fact table NEVER shuffles):
  *   1. one hash agg for per-group (min, max, count) — partial map-side,
  *      3 values per group per partition ride the exchange;
  *   2. broadcast the tiny per-group stats back, bin each value with
  *      codegen'd arithmetic, ONE (group, bin) hash agg — partial
  *      map-side, <= bins rows per group per partition;
  *   3. cumulative counts + interpolation over the aggregated frame only
  *      (groups x <= bins rows).
  *
  * Estimator: with rank r = ceil(q*n), the estimate interpolates inside
  * the first bin whose cumulative count reaches r:
  * `lo + w * (bin + (r - cumPrev)/cnt)`, error bounded by one bin width
  * `w = (hi-lo)/bins`. All arithmetic is IEEE-deterministic in both
  * engines: q in {.25,.5,.75} and 1/bins (power of two) are dyadic, so
  * q*n and (hi-lo)/bins are exact; the remaining ops evaluate in the
  * same order on identical doubles.
  *
  * Reference provenance: the reference's quantiles (transform.py quartile
  * buckets) are exact pandas quantile calls; this is the documented
  * at-scale swap, not a replacement of the a5/w9 exact oracle paths.
  */
object HistogramQuantiles {

  /** Per-`keyCol` estimated quantiles of `valueCol` (nulls ignored).
    * Output: key, n, and one `est_q<percent>` column per requested q.
    * Groups where min == max (or a single row) estimate every q inside
    * the single occupied bin — still within the error bound (w = 0). */
  def estimate(df: DataFrame, keyCol: String, valueCol: String,
               bins: Int = 128,
               qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(bins > 0 && (bins & (bins - 1)) == 0,
      s"bins must be a power of two for exact cross-engine width math, got $bins")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    val key = col(keyCol)
    val v = col(valueCol)
    // internal names are prefixed so they can never collide with caller
    // columns (the join below would otherwise be ambiguous)
    val stats = df.filter(v.isNotNull).groupBy(key.as("__hq_k"))
      .agg(min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))
    val width = (col("hi") - col("lo")) / bins
    val binned = df.filter(v.isNotNull)
      .join(broadcast(stats), key === col("__hq_k"))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(bins - 1).cast("long"), floor((v - col("lo")) / width)))
          .cast("int"))
      .groupBy(col("__hq_k"), col("bin"))
      .agg(count(lit(1)).as("cnt"),
        first("lo").as("lo"), first("hi").as("hi"), first("n").as("n"))
    val cum = binned.withColumn("cum",
      sum("cnt").over(Window.partitionBy("__hq_k").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val estCols: Seq[Column] = qs.map { q =>
      val r = ceil(lit(q) * col("n"))
      val est = col("lo") + width * (col("bin") +
        (r - col("cum") + col("cnt")).cast("double") / col("cnt"))
      // cumPrev < r <= cum holds for EXACTLY ONE bin (cum strictly
      // increases, r <= n), so the min aggregates a single row — the
      // interpolation is only ever evaluated where its fraction is in
      // (0, 1]
      min(when(col("cum") >= r && col("cum") - col("cnt") < r, est))
        .as(f"est_q${(q * 100).round}%d")
    }
    cum.groupBy(col("__hq_k").as(keyCol))
      .agg(first("n").as("n"), estCols: _*)
  }
}
