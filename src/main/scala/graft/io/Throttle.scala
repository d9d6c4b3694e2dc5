package graft.io

/** Rate-limited batched fetch (reference: src/extract.py:273-334, S3).
  *
  * The reference sleeps 12 s between sequential HTTP calls (5/min free
  * tier). Here the transport is pluggable (this container has no egress —
  * tests inject a stub), and the throttle paces calls at a fixed minimum
  * interval of 60s/rate — the reference's sleep, but only when actually
  * needed (a slow fetch already consumed the interval). Unused capacity
  * does NOT accumulate, so there are no bursts; that is deliberate for a
  * strict calls-per-minute quota, where a burst after idle would still
  * trip the provider's rolling window. This is DRIVER-side code by design:
  * the rate limit is per-API-key, i.e. global, so fetching cannot be
  * distributed without coordinating tokens; the fetched payloads land in a
  * directory (or Dataset) and all heavy work happens in Spark from there
  * (Sources.parseAlphaVantage).
  */
object Throttle {

  /** Fixed-interval pacer: successive acquire()s are spaced at least
    * 60s/ratePerMinute apart (no token accumulation, no bursts). */
  final class TokenBucket(ratePerMinute: Int,
                          nanoTime: () => Long = () => System.nanoTime(),
                          sleep: Long => Unit = Thread.sleep) {
    private val intervalNanos = 60e9.toLong / ratePerMinute
    private var nextFree = 0L

    /** Blocks until a token is available, then consumes it. */
    def acquire(): Unit = synchronized {
      val now = nanoTime()
      val at = math.max(now, nextFree)
      nextFree = at + intervalNanos
      val waitMs = (at - now) / 1000000L
      if (waitMs > 0) sleep(waitMs)
    }
  }

  /** One symbol through the bucket with retry + linear backoff; None when
    * retries exhaust. THE single definition of the pacing/retry/placeholder
    * semantics — shared by the driver-side [[fetchAll]] and the DSv2
    * reader (io/FetchSource), so the two can never drift. */
  def fetchPaced(bucket: TokenBucket, symbol: String, retries: Int,
                 backoffMs: Long, sleep: Long => Unit = Thread.sleep)
                (fetchOne: String => String): Option[String] = {
    var attempt = 0
    var result: Option[String] = None
    while (result.isEmpty && attempt <= retries) {
      bucket.acquire()
      try result = Some(fetchOne(symbol))
      catch {
        case _: Exception =>
          attempt += 1
          if (attempt <= retries) sleep(backoffMs * attempt)
      }
    }
    result
  }

  /** Fetch every symbol through `fetchOne`, never exceeding
    * `ratePerMinute`; failures become None placeholders preserving order
    * (reference: src/extract.py:315 — filtered downstream as F8). */
  def fetchAll(symbols: Seq[String], ratePerMinute: Int = 5,
               retries: Int = 2, backoffMs: Long = 1000,
               sleep: Long => Unit = Thread.sleep)
              (fetchOne: String => String): Seq[Option[String]] = {
    val bucket = new TokenBucket(ratePerMinute, sleep = sleep)
    symbols.map(fetchPaced(bucket, _, retries, backoffMs, sleep)(fetchOne))
  }
}
