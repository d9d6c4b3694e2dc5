package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Alerts
import graft.io.Throttle

/** End-to-end ETL orchestration (SURVEY §3.1) with stubbed transport —
  * extract -> transform -> validate -> load -> summary -> alert. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def payload(symbol: String, days: Int): String = {
    val series = (1 to days).map { i =>
      val p = 100.0 + i
      f"""\"2024-01-$i%02d\": {\"1. open\": \"${p - 1}\", \"2. high\": \"${p + 2}\",
         |\"3. low\": \"${p - 2}\", \"4. close\": \"$p\", \"5. volume\": \"${1000000 + i}\"}""".stripMargin
    }.mkString(",")
    s"""{"Meta Data": {"2. Symbol": "$symbol"}, "Time Series (Daily)": {$series}}"""
  }

  test("runEtl: fetch-shaped payloads through to loaded lake + summary + no alert") {
    val channel = new Alerts.LogChannel
    val out = java.nio.file.Files.createTempDirectory("graft-etl").resolve("lake").toString
    val payloads = Seq("AAPL", "MSFT").map(s => payload(s, 25)).toDF("json")

    val result = Pipeline.runEtl(spark, payloads, "json", out, channel)
    assert(result.recordsLoaded == 50)
    assert(result.qualityPassRate >= 0.9) // clean synthetic data passes the gate
    assert(result.alert.isEmpty && channel.sent.isEmpty)

    val loaded = spark.read.parquet(out)
    assert(loaded.columns.contains("ma_20") && loaded.columns.contains("volume_category"))
    assert(result.summary.head.getAs[Long]("unique_symbols") == 2)

    // the validation run is persisted (reference writes logs/data_quality_*.txt)
    val report = spark.read.json(result.qualityReportPath)
    assert(report.count() >= 13, "persisted quality report holds the check rows")
    assert(report.columns.contains("passed") && report.columns.contains("validated_at"))
    // the "_"-prefixed report dir must stay invisible to the lake reader
    assert(loaded.count() == result.recordsLoaded)
  }

  test("runEtl: all fetches failed -> Critical alert, no crash on empty lake") {
    val channel = new Alerts.LogChannel
    val out = java.nio.file.Files.createTempDirectory("graft-etl-empty").resolve("lake").toString
    val payloads = Seq[String](null, null).toDF("json")
    val result = Pipeline.runEtl(spark, payloads, "json", out, channel)
    assert(result.recordsLoaded == 0)
    assert(result.alert.exists(_.severity == Alerts.Critical))
    assert(channel.sent.nonEmpty)
  }

  test("runEtl: partial fetch (null placeholder among payloads) -> Warning") {
    val channel = new Alerts.LogChannel
    val out = java.nio.file.Files.createTempDirectory("graft-etl-partial").resolve("lake").toString
    val payloads = Seq(payload("AAPL", 25), null).toDF("json")
    val result = Pipeline.runEtl(spark, payloads, "json", out, channel)
    assert(result.recordsLoaded == 25)
    assert(result.alert.exists(_.severity == Alerts.Warning),
      s"expected partial-fetch warning, got ${result.alert}")
  }

  test("runEtl keep-last honors fetch_seq arrival order on re-fetched symbols") {
    val out = java.nio.file.Files.createTempDirectory("graft-seq").toString
    // same symbol fetched twice in one batch: the later fetch carries a
    // corrected close for every day and must win, regardless of hash order
    def seqPayload(bump: Double): String = {
      val series = (1 to 5).map { i =>
        val p = 100.0 + i + bump
        f"""\"2024-01-$i%02d\": {\"1. open\": \"${p - 1}\", \"2. high\": \"${p + 2}\",
           |\"3. low\": \"${p - 2}\", \"4. close\": \"$p\", \"5. volume\": \"1000\"}""".stripMargin
      }.mkString(",")
      s"""{"Meta Data": {"2. Symbol": "DUP"}, "Time Series (Daily)": {$series}}"""
    }
    val payloads = Seq((1L, seqPayload(0.0)), (2L, seqPayload(0.5)))
      .toDF("fetch_seq", "json")
    Pipeline.runEtl(spark, payloads, "json", out)
    val closes = spark.read.parquet(out)
      .select("date", "close").collect()
      .map(r => r.get(0).toString -> r.getDouble(1)).toMap
    assert(closes.size == 5)
    // every surviving close is from the bump=0.5 (later) fetch
    assert(closes.values.forall(c => (c * 2) % 1 == 0 && c % 1 != 0),
      s"stale fetch won: $closes")
  }

  test("runEtl appends across runs (reference accumulates daily batches)") {
    val out = java.nio.file.Files.createTempDirectory("graft-etl-append").resolve("lake").toString
    val payloads = Seq(payload("AAPL", 25)).toDF("json")
    val r1 = Pipeline.runEtl(spark, payloads, "json", out)
    val r2 = Pipeline.runEtl(spark, payloads, "json", out)
    assert(r1.recordsLoaded == 25 && r2.recordsLoaded == 50)
    // quality reports accumulate one per run, like the reference's
    // timestamped log files: run 2's report dir holds BOTH runs' check rows
    val perRun = spark.read.json(r1.qualityReportPath).count() / 2
    assert(perRun >= 13, s"each run persists the full check suite, got $perRun")
  }

  test("throttled fetch preserves order, retries, and None-placeholders failures") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Throttle.fetchAll(Seq("A", "B", "C"), ratePerMinute = 600,
      retries = 1, backoffMs = 10, sleep = sleeps += _) {
      case "B" => calls += 1; throw new RuntimeException("rate limited")
      case s   => calls += 1; s"payload-$s"
    }
    assert(out == Seq(Some("payload-A"), None, Some("payload-C")))
    assert(calls == 4) // A, B, B-retry, C
    assert(sleeps.nonEmpty) // backoff happened
  }

  test("token bucket spaces acquisitions at the configured rate") {
    var clock = 0L
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bucket = new Throttle.TokenBucket(5, nanoTime = () => clock, sleep = waits += _)
    bucket.acquire() // t=0, free
    bucket.acquire() // must wait 12 s
    assert(waits.lastOption.contains(12000L))
  }

  test("alert decisions: zero records / quality miss / partial fetch") {
    assert(Alerts.evaluateRun(0, 5, 5, 1.0).exists(_.severity == Alerts.Critical))
    assert(Alerts.evaluateRun(100, 5, 5, 0.5).exists(_.severity == Alerts.Critical))
    assert(Alerts.evaluateRun(100, 5, 3, 1.0).exists(_.severity == Alerts.Warning))
    assert(Alerts.evaluateRun(100, 5, 5, 0.95).isEmpty)
  }
}
