package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Writers (reference: S6-S9 in SURVEY §2.1). The reference's chunked
  * INSERT batching (src/load.py:239-263) maps to the JDBC writer's
  * `batchsize`; its per-batch error isolation is replaced by Spark task
  * retries. For the lake path, partitioning by symbol reproduces the
  * reference's (symbol, date) composite index as partition pruning.
  */
object Sinks {

  /** S8: CSV sink with header (reference: src/transform.py:447-448). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S9: JSON sink (reference: src/extract.py:450-452). */
  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** ORC sink: the columnar alternative for warehouses standardized on the
    * ORC/Hive stack — same pushdown/pruning properties as the parquet lake
    * path (spark-avro is not on this classpath, so ORC is the second
    * columnar format offered). */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Lake sink: parquet partitioned by symbol — the scale analog of the
    * reference's symbol/(symbol,date) indexes (src/load.py:87-89): per-symbol
    * queries prune partitions instead of probing a B-tree. Default mode is
    * append, matching the reference's accumulate-daily-batches load
    * (src/load.py:252 if_exists='append'). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String] = Seq("symbol"),
                       mode: String = "append"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed lake sink: the shuffle-elimination layout. A table bucketed
    * (and sorted) by symbol lets every downstream per-symbol groupBy/window/
    * join run WITHOUT an exchange — the write pays the shuffle once, every
    * reader skips it (SinksSpec proves the plan has no hashpartitioning).
    * This is the durable form of the pipeline's single symbol repartition. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, "symbol")
      .sortBy("symbol", "date")
      .format("parquet")
      .saveAsTable(table)

  /** Morton bit-spread: place the low 16 bits of `c` at even positions
    * (standard magic-mask doubling), all built-in bitwise expressions —
    * codegen'd, no UDF. */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton-curve) clustered lake sink — the multi-dimensional
    * data-skipping layout (the OPTIMIZE ZORDER analog; Morton 1966).
    * Partitioning prunes ONE dimension; a sort clusters one more at the
    * row-group level but leaves every other dimension's min/max spanning
    * the whole table. Interleaving the bits of two scaled key columns
    * gives files/row-groups whose min/max stats are TIGHT in BOTH
    * dimensions, so predicates on either key (or both) skip most of a
    * 100 TB table at the footer level.
    *
    * Mechanics: a tiny min/max pre-pass broadcasts back (single-row
    * cross join — the global-max-date pattern, no collect); each key
    * scales to a 16-bit lattice with codegen'd row math; the morton code
    * is pure bitwise spreading; `repartitionByRange(__z)` +
    * `sortWithinPartitions(__z)` lay rows down the curve. Everything is
    * one exchange (the range partition) at any scale. SinksSpec proves
    * the layout property directly: per-file extents shrink in BOTH
    * dimensions, where a 1-d sort leaves the second dimension's extent
    * at the global range. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int = 8): Unit = {
    val stats = df.agg(
      min(col(xCol)).cast("double").as("__xmin"),
      max(col(xCol)).cast("double").as("__xmax"),
      min(col(yCol)).cast("double").as("__ymin"),
      max(col(yCol)).cast("double").as("__ymax"))
    def lattice(c: Column, lo: Column, hi: Column): Column =
      least(lit(65535L), greatest(lit(0L),
        floor((c.cast("double") - lo) / (hi - lo + lit(1e-12)) * 65536)
          .cast("long")))
    val b = df.crossJoin(broadcast(stats))
    val z = spread16(lattice(col(xCol), col("__xmin"), col("__xmax")))
      .bitwiseOR(shiftleft(
        spread16(lattice(col(yCol), col("__ymin"), col("__ymax"))), 1))
    b.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__xmin", "__xmax", "__ymin", "__ymax")
      .write.mode("overwrite").parquet(path)
  }

  /** S6: JDBC append sink (reference: src/load.py:176-288). `batchsize`
    * reproduces the 1000-row INSERT chunking. Untested here (no DB in the
    * harness); compiled surface only. */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties, batchSize: Int = 1000): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, props)
  }
}
