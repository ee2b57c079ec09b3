package graft.processor

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/** Per-partition attempt-timeout enforcement at ~nanosecond per-record cost.
  *
  * One scheduled checker per partition wakes every `timeoutMs / 8`
  * (min 10 ms) and interrupts the partition thread if the armed attempt's
  * deadline has passed. Per record the hot path pays only an uncontended
  * `synchronized` arm/disarm — versus a thread handoff per record in a
  * run-on-worker design (~10 µs), which at 10^9 records/core is hours.
  *
  * Semantics match the reference's `tokio::select!` race
  * (`/root/reference/src/processor.rs:1517-1522`): callbacks blocked in
  * interruptible waits (sleep/IO) are preempted; a callback that never
  * yields the CPU is not preemptible — exactly like a non-yielding future
  * under tokio's select. Timeout resolution is `timeoutMs + checker period`.
  *
  * The fire/disarm race is closed with a lock: the checker interrupts only
  * while holding it, and `disarm` (same lock) clears any stray interrupt
  * flag — an expired watchdog can never leak an interrupt into the next
  * record.
  */
final class PartitionWatchdog(timeoutMs: Long) extends AutoCloseable {

  private val lock = new Object
  private var armedThread: Thread = _
  private var deadlineNanos: Long = Long.MaxValue
  private var fired: Boolean = false

  private val periodMs = math.max(10L, timeoutMs / 8)
  private val scheduler: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-attempt-watchdog")
      t.setDaemon(true)
      t
    })
  scheduler.scheduleAtFixedRate(() => check(), periodMs, periodMs, TimeUnit.MILLISECONDS)

  private def check(): Unit = lock.synchronized {
    if (armedThread != null && !fired && System.nanoTime() > deadlineNanos) {
      fired = true
      armedThread.interrupt()
    }
  }

  /** Arm for one attempt on the calling thread. */
  def arm(): Unit = lock.synchronized {
    armedThread = Thread.currentThread()
    deadlineNanos = System.nanoTime() + timeoutMs * 1000000L
    fired = false
  }

  /** Disarm after the attempt; returns true if the watchdog fired for it.
    * Clears a stray interrupt flag from a fire that raced completion. */
  def disarm(): Boolean = lock.synchronized {
    val didFire = fired
    armedThread = null
    deadlineNanos = Long.MaxValue
    if (didFire) { Thread.interrupted(); () } // clear, don't leak to next record
    fired = false
    didFire
  }

  override def close(): Unit = { scheduler.shutdownNow(); () }
}
