package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable fetch transport for the `graft-fetch` source. Implementations
  * need a public no-arg constructor (instantiated reflectively on the
  * executor); `fetch` returns the raw payload string or throws on failure
  * (failures retry, then land as a null payload — the F8 filter shape).
  * This container has no egress, so the shipped transports are test stubs;
  * a production deployment drops in an HTTP implementation. */
trait FetchTransport extends Serializable {
  def fetch(symbol: String): String
}

/** DataSource V2 ingestion for rate-limited symbol fetches (reference:
  * src/extract.py:18-157, :273-334 — S1/S3): makes the fetch→land step
  * drivable as `spark.read.format("graft-fetch")`, so ingestion composes
  * with Catalyst like any other table and feeds Sources.parseAlphaVantage
  * directly.
  *
  * The scan plans exactly ONE input partition on purpose: the quota being
  * paced is per-API-key, i.e. GLOBAL — parallel fetch tasks would race one
  * rolling window and trip the provider (the same reason Throttle is
  * driver-side). One task paced at 60s/rate is the fastest legal plan; with
  * multiple keys a deployment runs one `graft-fetch` frame per key and
  * unions them. Payload parsing — the actually heavy part — distributes
  * fully once the landed frame hits parseAlphaVantage.
  *
  * Also a STREAMING source (`spark.readStream.format("graft-fetch")`):
  * each trigger fetches one paced round of all symbols — the reference
  * scheduler's poll-every-N-minutes cadence expressed as a
  * `MicroBatchStream` with checkpointed round offsets (a restart never
  * re-emits a committed round); `Trigger.AvailableNow` runs exactly one
  * round, `ProcessingTime` polls continuously.
  *
  * Options: `symbols` (comma-separated, required), `transport`
  * ([[FetchTransport]] class name, required), `ratePerMinute` (default 5),
  * `retries` (default 2), `backoffMs` (default 1000).
  *
  * Output schema: (fetch_seq LONG, symbol STRING, payload STRING) —
  * fetch_seq is the arrival order, the same deterministic keep-last
  * tiebreak key F4 dedup uses.
  */
class GraftFetchProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fetch"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FetchSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftFetchTable
}

object FetchSource {
  val schema: StructType = StructType(Seq(
    StructField("fetch_seq", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("payload", StringType, nullable = true)))
}

private[io] case class FetchConfig(symbols: Seq[String], transportClass: String,
                                   ratePerMinute: Int, retries: Int,
                                   backoffMs: Long)

private[io] class GraftFetchTable extends Table with SupportsRead {
  override def name(): String = "graft-fetch"
  override def schema(): StructType = FetchSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def required(key: String): String = {
      val v = options.get(key)
      if (v == null || v.isEmpty)
        throw new IllegalArgumentException(s"graft-fetch requires option '$key'")
      v
    }
    val symbols = required("symbols").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // " , " passes the raw non-empty check but names no symbol — a typo'd
    // list must fail the job, not land an empty frame downstream
    if (symbols.isEmpty)
      throw new IllegalArgumentException(
        "graft-fetch requires option 'symbols' to name at least one symbol")
    new GraftFetchScan(FetchConfig(
      symbols = symbols,
      transportClass = required("transport"),
      ratePerMinute = options.getInt("ratePerMinute", 5),
      retries = options.getInt("retries", 2),
      backoffMs = options.getLong("backoffMs", 1000L)))
  }
}

/** Streaming offset: the number of completed fetch ROUNDS (one round =
  * every configured symbol fetched once). */
private[io] case class FetchOffset(round: Long) extends Offset {
  override def json(): String = round.toString
}

private[io] class GraftFetchScan(cfg: FetchConfig)
  extends ScanBuilder with Scan with Batch
  with MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {
  override def build(): Scan = this
  override def readSchema(): StructType = FetchSource.schema

  // ---- batch: one round, one paced partition (per-key quota is global).
  // NOTE a batch frame re-runs the paced fetch on EVERY action (count,
  // write, ...), each spending quota — land the frame immediately (write
  // to the landing dir, or localCheckpoint) and compute from the landed
  // copy; the streaming form below does this bookkeeping for you.
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(FetchPartition(cfg, firstRound = 0L, lastRound = 0L))
  override def createReaderFactory(): PartitionReaderFactory =
    new FetchReaderFactory

  // ---- streaming: one fetch round per trigger — the reference scheduler's
  // cadence (poll every N minutes) without a scheduler: ProcessingTime
  // triggers re-fetch every interval, AvailableNow runs exactly one round.
  // Offsets count completed rounds. Progression is STATELESS via
  // SupportsAdmissionControl: latestOffset(start, _) = start + 1, so a
  // restart from checkpoint resumes exactly where the committed offset
  // says — no instance-local counter to fall out of sync (a fresh scan
  // with a mutable counter would report an already-committed round as
  // "latest" after a clean restart and fetch nothing).
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = this
  override def initialOffset(): Offset = FetchOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  // AvailableNow contract: cap "latest" at one round past wherever the
  // restored start offset is when the run begins, so the query fetches
  // exactly one fresh round and terminates; ProcessingTime (no prepare
  // call) never caps and polls a round per trigger.
  private var capPending = false
  private var capRound = Long.MaxValue
  override def prepareForTriggerAvailableNow(): Unit = { capPending = true }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FetchOffset].round
    if (capPending) { capRound = s + 1; capPending = false }
    FetchOffset(math.min(s + 1, capRound))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-fetch reports offsets via SupportsAdmissionControl")
  override def deserializeOffset(json: String): Offset =
    FetchOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FetchOffset].round
    val e = end.asInstanceOf[FetchOffset].round
    if (e <= s) Array.empty
    else Array(FetchPartition(cfg, firstRound = s, lastRound = e - 1))
  }
}

/** Rounds [firstRound, lastRound], inclusive, in ONE partition — pacing is
  * global per API key. */
private[io] case class FetchPartition(cfg: FetchConfig, firstRound: Long,
                                      lastRound: Long) extends InputPartition

private[io] class FetchReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FetchReader(partition.asInstanceOf[FetchPartition])
}

/** Executor-side paced fetcher: same pacing/retry/placeholder semantics as
  * Throttle.fetchAll (the driver-side twin), one row per symbol in request
  * order; `fetch_seq = round * nSymbols + i` stays globally increasing
  * across streaming rounds, so keep-last dedup (F4) works on it directly. */
private[io] class FetchReader(part: FetchPartition)
  extends PartitionReader[InternalRow] {
  private val cfg = part.cfg
  private val transport = Class.forName(cfg.transportClass)
    .getDeclaredConstructor().newInstance().asInstanceOf[FetchTransport]
  private val bucket = new Throttle.TokenBucket(cfg.ratePerMinute)
  private val n = cfg.symbols.length
  private var i = -1L
  private val total = (part.lastRound - part.firstRound + 1) * n
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= total) return false
    val sym = cfg.symbols((i % n).toInt)
    val result = Throttle.fetchPaced(bucket, sym, cfg.retries,
      cfg.backoffMs)(transport.fetch)
    current = InternalRow((part.firstRound + i / n) * n + i % n,
      UTF8String.fromString(sym),
      result.map(UTF8String.fromString).orNull)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
