package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
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
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def required(key: String): String = {
      val v = options.get(key)
      if (v == null || v.isEmpty)
        throw new IllegalArgumentException(s"graft-fetch requires option '$key'")
      v
    }
    new GraftFetchScan(FetchConfig(
      symbols = required("symbols").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      transportClass = required("transport"),
      ratePerMinute = options.getInt("ratePerMinute", 5),
      retries = options.getInt("retries", 2),
      backoffMs = options.getLong("backoffMs", 1000L)))
  }
}

private[io] class GraftFetchScan(cfg: FetchConfig)
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = FetchSource.schema
  override def toBatch: Batch = this
  // one partition — the per-key quota is global (see class doc)
  override def planInputPartitions(): Array[InputPartition] =
    Array(FetchPartition(cfg))
  override def createReaderFactory(): PartitionReaderFactory =
    new FetchReaderFactory
}

private[io] case class FetchPartition(cfg: FetchConfig) extends InputPartition

private[io] class FetchReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FetchReader(partition.asInstanceOf[FetchPartition].cfg)
}

/** Executor-side paced fetcher: same pacing/retry/placeholder semantics as
  * Throttle.fetchAll (the driver-side twin), one row per symbol in request
  * order. */
private[io] class FetchReader(cfg: FetchConfig)
  extends PartitionReader[InternalRow] {
  private val transport = Class.forName(cfg.transportClass)
    .getDeclaredConstructor().newInstance().asInstanceOf[FetchTransport]
  private val bucket = new Throttle.TokenBucket(cfg.ratePerMinute)
  private var i = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= cfg.symbols.length) return false
    val sym = cfg.symbols(i)
    var attempt = 0
    var result: Option[String] = None
    while (result.isEmpty && attempt <= cfg.retries) {
      bucket.acquire()
      try result = Some(transport.fetch(sym))
      catch {
        case _: Exception =>
          attempt += 1
          if (attempt <= cfg.retries) Thread.sleep(cfg.backoffMs * attempt)
      }
    }
    current = InternalRow(i.toLong, UTF8String.fromString(sym),
      result.map(UTF8String.fromString).orNull)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
