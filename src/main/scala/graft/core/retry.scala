package graft.core

import java.util.concurrent.atomic.AtomicBoolean

/** Backoff strategies. Reference: `src/retry/backoff.rs`. */
sealed trait Backoff {
  /** Delay before retry number `attempt` (0-based). */
  def delayMs(attempt: Int): Long
}

/** Exponential backoff with jitter, replicating the reference's exact
  * cap-before-jitter-then-cap-again formula (`src/retry/backoff.rs:39-65`):
  *
  *   base   = min(initial * multiplier^attempt, max)
  *   jitter = base * jitterFactor * U(-1, 1)
  *   delay  = min(max(base + jitter, 0), max)
  *
  * Defaults mirror `src/retry/backoff.rs:87-96`: 100 ms initial, 30 s cap,
  * multiplier 2.0, jitter ±10%. Jitter draws from a seedable RNG so tests can
  * pin bounds like the reference's `src/retry/backoff.rs:185-206`.
  */
final case class ExponentialBackoff(
    initialDelayMs: Long = 100L,
    maxDelayMs: Long = 30000L,
    multiplier: Double = 2.0,
    jitterFactor: Double = 0.1,
    seed: Option[Long] = None
) extends Backoff {
  private[this] val rng = seed.fold(new java.util.Random())(new java.util.Random(_))

  override def delayMs(attempt: Int): Long = {
    val raw = initialDelayMs.toDouble * math.pow(multiplier, attempt.toDouble)
    val capped = math.min(raw, maxDelayMs.toDouble)
    val jitter = capped * jitterFactor * (rng.nextDouble() * 2.0 - 1.0)
    val jittered = math.max(capped + jitter, 0.0)
    math.min(jittered, maxDelayMs.toDouble).toLong
  }
}

/** Constant delay. Reference: `src/retry/backoff.rs:129-151`. */
final case class FixedBackoff(delay: Long) extends Backoff {
  override def delayMs(attempt: Int): Long = delay
}

/** Retry policy. Reference defaults (`src/retry/mod.rs:14-35`): infinite
  * retries (`maxRetries = None`), exponential backoff 100 ms → 30 s. */
final case class RetryConfig(
    maxRetries: Option[Int] = None,
    backoff: Backoff = ExponentialBackoff()
)

/** Cooperative shutdown signal — the watch-channel equivalent
  * (reference `src/processor.rs:532-552` and every await point).
  *
  * Serializable so it can ride in task closures, but note: a closure gets a
  * serialized COPY, so a trigger() after task launch is not visible across
  * JVM/serialization boundaries. Same-JVM uses (driver-side commit loops,
  * tests, local mode direct calls) see it live; executor-side cancellation
  * is Spark task interruption, which the processing loop also honors. */
final class ShutdownSignal extends Serializable {
  private[this] val flag = new AtomicBoolean(false)
  def trigger(): Unit = flag.set(true)
  def isShutdown: Boolean = flag.get()
}
object ShutdownSignal {
  /** A signal that never fires (the reference's dummy channel trick,
    * `src/store/dynamodb.rs:111`). */
  def never: ShutdownSignal = new ShutdownSignal
}

/** Generic retry of a fallible operation: bounded or infinite attempts,
  * backoff sleep between attempts, raced against shutdown.
  * Reference: `src/retry/mod.rs:54-111`.
  *
  * Plain JVM utility — used inside `foreachBatch` and store implementations;
  * no Spark primitive involved (SURVEY §2.5).
  */
object RetryHandle {
  /** Run `op` until it succeeds, retries are exhausted, or shutdown fires.
    * Sleep is chunked so an in-flight backoff wakes promptly on shutdown
    * (the reference races the sleep against the watch channel).
    *
    * Deliberate deviation from the reference's attempt indexing: the
    * reference passes a 1-based count to `next_delay` (first sleep =
    * initial×multiplier; `retry/mod.rs:88`) and `maxRetries = N` means N
    * total calls (`retry/mod.rs:79-85`). Here the backoff index is 0-based
    * (first sleep = the configured initial delay — the conventional
    * schedule) and `maxRetries = N` means N retries after the first call
    * (N+1 calls), which matches the reference's own processor-level test
    * expectation (`processor.rs:2212`). */
  def retry[A](config: RetryConfig, shutdown: ShutdownSignal = ShutdownSignal.never)(
      op: Int => A): Either[RetryError, A] = {
    var attempt = 0
    while (true) {
      if (shutdown.isShutdown) return Left(RetryError.Interrupted("shutdown before attempt"))
      try return Right(op(attempt))
      catch {
        case scala.util.control.NonFatal(e) =>
          val exhausted = config.maxRetries.exists(attempt >= _)
          if (exhausted) return Left(RetryError.ExhaustedRetries(attempt, e))
          val delay = config.backoff.delayMs(attempt)
          val deadline = System.nanoTime() + delay * 1000000L
          while (System.nanoTime() < deadline) {
            if (shutdown.isShutdown) return Left(RetryError.Interrupted("shutdown during backoff"))
            val remainMs = (deadline - System.nanoTime()) / 1000000L
            if (remainMs > 0) Thread.sleep(math.min(remainMs, 10L))
          }
          attempt += 1
      }
    }
    sys.error("unreachable")
  }
}
