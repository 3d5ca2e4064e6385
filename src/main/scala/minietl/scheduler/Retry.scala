package minietl.scheduler

/** Exponential-backoff retry (reference: mini_etl/core/retry.py:22-104 —
  * max 3 attempts, 1s → 60s, base 2, retrying connection-ish failures).
  * Spark already retries TASKS (`spark.task.maxFailures`); this utility is
  * for driver-side I/O around the engine (e.g. paginated API fetches before
  * `createDataFrame`), not for distributed work.
  */
object Retry {

  final case class RetryConfig(
      maxAttempts: Int = 3,
      initialDelayMs: Long = 1000L,
      maxDelayMs: Long = 60000L,
      backoffBase: Double = 2.0,
      retryOn: Throwable => Boolean = defaultRetryOn,
      sleep: Long => Unit = Thread.sleep)

  /** The reference retries ConnectionError/TimeoutError/OSError
    * (retry.py:26-29); the JVM analog is IOException + timeouts.
    */
  def defaultRetryOn(t: Throwable): Boolean = t match {
    case _: java.io.IOException => true
    case _: java.util.concurrent.TimeoutException => true
    case _: java.net.SocketTimeoutException => true
    case _ => false
  }

  def withBackoff[T](config: RetryConfig = RetryConfig())(f: => T): T = {
    var attempt = 1
    var delay = config.initialDelayMs
    while (true) {
      try return f
      catch {
        case t: Throwable if attempt < config.maxAttempts && config.retryOn(t) =>
          config.sleep(delay)
          delay = math.min((delay * config.backoffBase).toLong, config.maxDelayMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
