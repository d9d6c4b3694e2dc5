package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{Alerts, Summary}
import graft.io.{Sinks, Sources}
import graft.model.Schemas
import graft.ops.{Cleaning, Derive}
import graft.quality.Expectations

/** The reference's primary entry point re-expressed as one lazy Spark plan
  * per stage (reference: src/pipeline.py:119-398, traced in SURVEY §3.1):
  *
  *   EXTRACT (payload strings) -> TRANSFORM (parse + clean + derive)
  *   -> VALIDATE (expectation suite) -> LOAD (partitioned lake sink)
  *   -> SUMMARY (A1-A4 aggregates) -> ALERT (channel)
  *
  * Unlike the reference, stages don't materialize between steps — the
  * transform is a single Catalyst plan; only VALIDATE/SUMMARY/LOAD are
  * actions. The scheduler analog is a cron'd spark-submit of this, or the
  * streaming twin (streaming.StreamPipeline) with a processing-time
  * trigger.
  */
object Pipeline {

  final case class RunResult(recordsLoaded: Long, qualityPassRate: Double,
                             summary: DataFrame, alert: Option[Alerts.Alert],
                             qualityReportPath: String)

  /** payloads: one Alpha-Vantage-shaped JSON string per symbol envelope
    * (what Throttle.fetchAll + a transport produce). */
  def runEtl(spark: SparkSession, payloads: DataFrame, jsonCol: String,
             outPath: String, channel: Alerts.Channel = new Alerts.LogChannel,
             symbolsRequested: Int = -1): RunResult = {
    // TRANSFORM: parse (S1) -> quality filters + dedup (F1-F4) -> features.
    // Keep-last needs a deterministic tiebreak, NOT
    // monotonically_increasing_id: this plan is executed by several actions
    // (validate, count, write, summary), and a nondeterministic row id can
    // pick a DIFFERENT dedup winner per action under task retry/reorder —
    // the validated winner must be the written winner. When the caller
    // stamps payload envelopes with a `fetch_seq` arrival order, the LATEST
    // fetch wins (the reference's pandas keep='last' positional semantics);
    // without it, conflicting same-(symbol,date) rows fall back to a
    // content-hash winner — deterministic, but unrelated to arrival order.
    val hasSeq = payloads.columns.contains("fetch_seq")
    val parsed = Sources.parseAlphaVantage(payloads, jsonCol,
        passthrough = if (hasSeq) Seq("fetch_seq") else Nil)
      .withColumn("__chash", xxhash64(col("symbol"), col("date"), col("open"),
        col("high"), col("low"), col("close"), col("volume")))
    val tiebreak =
      if (hasSeq) struct(col("fetch_seq"), col("__chash")) else col("__chash")
    val cleaned = Cleaning.clean(parsed, tiebreak)
      .drop((if (hasSeq) Seq("fetch_seq", "__chash") else Seq("__chash")): _*)
    val features = Derive.addDerived(cleaned)
      .withColumn("extracted_at", current_timestamp())
      .withColumn("data_source", lit("Alpha Vantage"))
    val ordered = Cleaning.reorderColumns(features,
      Schemas.featureColumns :+ "extracted_at")

    // VALIDATE (A11) — the reference's >= 90% gate. Every validation run is
    // persisted next to the lake (reference: src/data_quality.py:242-273
    // writes logs/data_quality_*.txt); the "_" prefix keeps the report dir
    // invisible to spark.read.parquet(outPath).
    val report = Expectations.qualityReport(features)
    val passRate = report.agg(avg(col("passed").cast("int"))).head.getDouble(0)
    val reportPath = s"$outPath/_quality_report"
    Sinks.writeJson(report.withColumn("validated_at", current_timestamp()),
      reportPath, mode = "append") // one report per run accumulates, like
                                   // the reference's timestamped log files

    // LOAD: partitioned lake append (S6/S7 analog: partition pruning
    // replaces the (symbol, date) composite index). Empty runs write
    // nothing — a zero-row partitioned write leaves an unreadable dir and
    // must still reach the Critical alert below, not crash on read-back.
    val records = ordered.count()
    if (records > 0) Sinks.writePartitioned(ordered, outPath)
    val lake = if (records > 0) spark.read.parquet(outPath) else ordered
    val loaded = if (records > 0) lake.count() else 0L

    // SUMMARY (A1-A4) + ALERT. symbolsFetched counts non-null envelopes
    // (failed fetches are null placeholders) so partial fetches Warn.
    val summary = Summary.databaseSummary(lake)
    val requested = if (symbolsRequested >= 0) symbolsRequested
      else payloads.count().toInt
    val fetched = payloads.filter(col(jsonCol).isNotNull).count().toInt
    val alert = Alerts.evaluateRun(loaded, requested,
      symbolsFetched = fetched, qualityPassRate = passRate)
    alert.foreach(channel.send)

    RunResult(loaded, passRate, summary, alert, reportPath)
  }
}
