package graft.sources

/** Driver-side retry with exponential backoff (SURVEY §2.2 E4).
  *
  * Spark tasks already retry (`spark.task.maxFailures`); this wrapper is
  * ONLY for driver-side connector calls (HTTP polling, control-plane
  * probes) — the reference applies it around extraction
  * (`src/ingestion/extractors.py:159-216`): backoff 2^(attempt-1) × base,
  * with a retryable-error classifier on exception type + message
  * substrings.
  */
object Retry {

  final class NonRetryableException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** Classifier mirroring `extractors.py:194-216`: connection/timeout
    * flavors retry; validation/schema/permission flavors do not. */
  def isRetryable(e: Throwable): Boolean = e match {
    case _: NonRetryableException => false
    case _: java.net.ConnectException | _: java.net.SocketTimeoutException |
         _: java.io.IOException => true
    case _ =>
      val m = Option(e.getMessage).getOrElse("").toLowerCase
      Seq("connection", "timeout", "temporary", "unavailable", "rate limit")
        .exists(m.contains)
  }

  /** Run `body` with ≤ `maxRetries` retries; backoff = base × 2^(n−1),
    * injected `sleep` for testability. */
  def withRetry[T](maxRetries: Int = 3, baseDelayMs: Long = 1000,
      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    var attempt = 0
    var lastError: Throwable = null
    while (attempt <= maxRetries) {
      try return body
      catch {
        case e: Throwable if isRetryable(e) && attempt < maxRetries =>
          lastError = e
          sleep(baseDelayMs * (1L << attempt))
          attempt += 1
        case e: Throwable => throw e
      }
    }
    throw lastError
  }
}
