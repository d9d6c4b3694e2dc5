package graft.io

import org.apache.spark.sql.DataFrame

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

  /** S6: JDBC append sink (reference: src/load.py:176-288). `batchsize`
    * reproduces the 1000-row INSERT chunking. Untested here (no DB in the
    * harness); compiled surface only. */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties, batchSize: Int = 1000): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, props)
  }
}
