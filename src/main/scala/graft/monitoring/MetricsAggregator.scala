package graft.monitoring

import scala.collection.concurrent.TrieMap

/** M4 — windowed per-shard metrics, mirroring the reference's
  * `ShardMetrics` fields (`/root/reference/src/monitoring/metrics.rs:24-51`)
  * and event-fold semantics (`metrics.rs:114-302`). Times in millis. */
final case class ShardMetrics(
    recordsProcessed: Long = 0,
    recordsFailed: Long = 0,
    retryAttempts: Long = 0,
    processingTimeMs: Long = 0,
    checkpointsSucceeded: Long = 0,
    checkpointsFailed: Long = 0,
    iteratorRenewals: Long = 0,
    iteratorFailures: Long = 0,
    softErrors: Long = 0,
    hardErrors: Long = 0,
    avgProcessingTimeMs: Double = 0.0,
    maxProcessingTimeMs: Long = 0,
    windowStartMs: Long,
    lastUpdatedMs: Long
)

/** Folds [[ProcessingEvent]]s into per-shard [[ShardMetrics]], emits a
  * snapshot per window, and evicts shards idle longer than 2× the window
  * (`metrics.rs:304-361`). This is the single-JVM mirror of the reference's
  * aggregator task, suitable for driver-side consumption of the engine's
  * event sinks; the cluster-scale path is [[MetricsAggregator.aggregate]],
  * the same fold as a Spark aggregation over an event Dataset.
  */
final class MetricsAggregator(
    windowMs: Long = 60000L,
    onEmit: (String, ShardMetrics) => Unit = (_, _) => (),
    clock: () => Long = () => System.currentTimeMillis()
) extends EventSink {

  private val metrics = TrieMap.empty[String, ShardMetrics]

  def snapshot: Map[String, ShardMetrics] = metrics.toMap

  override def emit(event: ProcessingEvent): Unit = processEvent(event)

  /** Event fold — one-to-one with `metrics.rs:114-302`. */
  def processEvent(event: ProcessingEvent): Unit = {
    val now = clock()
    val m0 = metrics.getOrElseUpdate(event.shardId,
      ShardMetrics(windowStartMs = now, lastUpdatedMs = now))
    val m1 = event.eventType match {
      case ProcessingEventType.RecordAttempt(_, success, attempt, durMs, error, isFinal) =>
        var m = m0
        if (success) m = m.copy(recordsProcessed = m.recordsProcessed + 1)
        else if (isFinal) {
          m = m.copy(recordsFailed = m.recordsFailed + 1)
          if (error.isDefined) m = m.copy(hardErrors = m.hardErrors + 1)
        } else m = m.copy(softErrors = m.softErrors + 1)
        if (attempt > 1) m = m.copy(retryAttempts = m.retryAttempts + 1)
        m = m.copy(processingTimeMs = m.processingTimeMs + durMs)
        val n = m.recordsProcessed + m.recordsFailed
        if (n > 0) m = m.copy(avgProcessingTimeMs = m.processingTimeMs.toDouble / n)
        if (durMs > m.maxProcessingTimeMs) m = m.copy(maxProcessingTimeMs = durMs)
        m
      case ProcessingEventType.BatchComplete(ok, fail, durMs) =>
        m0.copy(recordsProcessed = m0.recordsProcessed + ok,
          recordsFailed = m0.recordsFailed + fail,
          processingTimeMs = m0.processingTimeMs + durMs)
      case ProcessingEventType.BatchStart(_) => m0
      case ProcessingEventType.BatchMetrics(bm) =>
        m0.copy(recordsProcessed = m0.recordsProcessed + bm.successfulCount,
          recordsFailed = m0.recordsFailed + bm.failedCount,
          processingTimeMs = m0.processingTimeMs + bm.durationMs)
      case ProcessingEventType.BatchError(_, durMs) =>
        m0.copy(hardErrors = m0.hardErrors + 1,
          processingTimeMs = m0.processingTimeMs + durMs)
      case ProcessingEventType.RecordSuccess(_, ckptOk) =>
        val m = m0.copy(recordsProcessed = m0.recordsProcessed + 1)
        if (ckptOk) m.copy(checkpointsSucceeded = m.checkpointsSucceeded + 1) else m
      case ProcessingEventType.RecordFailure(_, _) =>
        m0.copy(recordsFailed = m0.recordsFailed + 1, hardErrors = m0.hardErrors + 1)
      case ProcessingEventType.CheckpointFailure(_, _) =>
        m0.copy(checkpointsFailed = m0.checkpointsFailed + 1)
      case ProcessingEventType.Iterator(t, _) => t match {
        case IteratorEventType.Renewed => m0.copy(iteratorRenewals = m0.iteratorRenewals + 1)
        case IteratorEventType.Failed => m0.copy(iteratorFailures = m0.iteratorFailures + 1)
        case _ => m0
      }
      case ProcessingEventType.ShardEvent(t, _) => t match {
        case ShardEventType.Error => m0.copy(hardErrors = m0.hardErrors + 1)
        case _ => m0
      }
      case ProcessingEventType.Checkpoint(_, success, _) =>
        if (success) m0.copy(checkpointsSucceeded = m0.checkpointsSucceeded + 1)
        else m0.copy(checkpointsFailed = m0.checkpointsFailed + 1)
    }
    metrics.put(event.shardId, m1.copy(lastUpdatedMs = now))
    ()
  }

  /** Window emission + idle eviction (> 2× window), `metrics.rs:304-361`. */
  def emitWindow(): Unit = {
    val now = clock()
    metrics.foreach { case (shardId, m) =>
      if (now - m.lastUpdatedMs > windowMs * 2) { metrics.remove(shardId); () }
      else onEmit(shardId, m)
    }
  }
}

object MetricsAggregator {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._

  /** Flat event row for the Dataset path (sealed-trait payloads flattened —
    * streaming-friendly schema). */
  final case class EventRow(
      timestampMs: Long,
      shardId: String,
      kind: String,
      success: Boolean,
      isFinalAttempt: Boolean,
      attemptNumber: Int,
      durationMs: Long,
      hasError: Boolean
  )

  def toRow(e: ProcessingEvent): EventRow = e.eventType match {
    case ProcessingEventType.RecordAttempt(_, ok, at, dur, err, fin) =>
      EventRow(e.timestampMs, e.shardId, "record_attempt", ok, fin, at, dur, err.isDefined)
    case ProcessingEventType.RecordSuccess(_, ck) =>
      EventRow(e.timestampMs, e.shardId, "record_success", true, true, 0, 0, false)
    case ProcessingEventType.RecordFailure(_, _) =>
      EventRow(e.timestampMs, e.shardId, "record_failure", false, true, 0, 0, true)
    case ProcessingEventType.Checkpoint(_, ok, _) =>
      EventRow(e.timestampMs, e.shardId, "checkpoint", ok, true, 0, 0, !ok)
    case ProcessingEventType.Iterator(t, _) =>
      EventRow(e.timestampMs, e.shardId, s"iterator_${t.toString.toLowerCase}", true, true, 0, 0, false)
    case other =>
      EventRow(e.timestampMs, e.shardId, other.getClass.getSimpleName.toLowerCase, true, true, 0, 0, false)
  }

  /** The 100 TB path for M4: the same fold as a declarative windowed
    * aggregation over an event Dataset — partial+final agg, no driver
    * state. Works on both static and streaming Datasets (with a watermark
    * upstream for streaming). */
  def aggregate(events: Dataset[EventRow], windowDuration: String = "60 seconds"): DataFrame =
    events
      .groupBy(window(timestamp_millis(col("timestampMs")), windowDuration), col("shardId"))
      .agg(
        // successes arrive as record_success, NOT record_attempt(success)
        // — processSingle emits only the former (`processor.rs:1499-1503`)
        // — so both kinds count, exactly like processEvent's fold; same
        // for final failures, which arrive as record_failure
        sum(when(col("kind") === "record_success" ||
          (col("kind") === "record_attempt" && col("success")), 1L).otherwise(0L))
          .as("records_processed"),
        sum(when(col("kind") === "record_failure" ||
          (col("kind") === "record_attempt" && !col("success") && col("isFinalAttempt")), 1L)
          .otherwise(0L)).as("records_failed"),
        sum(when(col("kind") === "record_attempt" && !col("success") && !col("isFinalAttempt"), 1L)
          .otherwise(0L)).as("soft_errors"),
        sum(when(col("kind") === "record_failure", 1L).otherwise(0L)).as("hard_errors"),
        sum(when(col("kind") === "record_attempt" && col("attemptNumber") > 1, 1L).otherwise(0L))
          .as("retry_attempts"),
        sum(when(col("kind") === "checkpoint" && col("success"), 1L).otherwise(0L))
          .as("checkpoints_succeeded"),
        sum(when(col("kind") === "checkpoint" && !col("success"), 1L).otherwise(0L))
          .as("checkpoints_failed"),
        sum(when(col("kind") === "iterator_renewed", 1L).otherwise(0L)).as("iterator_renewals"),
        sum(col("durationMs")).as("processing_time_ms"),
        max(col("durationMs")).as("max_processing_time_ms"))
}

/** M5 — test monitoring harness, the mirror of `TestMonitoringHarness`
  * (`/root/reference/src/monitoring/types.rs:277-512`): await named event
  * patterns with timeout over a bounded queue; full history retained. */
final class TestMonitoringHarness(capacity: Int = 10000) extends EventSink {
  private val history = new java.util.concurrent.CopyOnWriteArrayList[ProcessingEvent]()

  override def emit(event: ProcessingEvent): Unit = {
    if (history.size < capacity) { history.add(event); () }
  }

  def events: Vector[ProcessingEvent] = {
    val it = history.iterator()
    val b = Vector.newBuilder[ProcessingEvent]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Await until `predicate` matches at least `count` events or timeout;
    * returns the matches (empty on timeout — callers assert). */
  def waitForEvents(
      predicate: ProcessingEvent => Boolean,
      count: Int = 1,
      timeoutMs: Long = 5000L): Vector[ProcessingEvent] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      val matches = events.filter(predicate)
      if (matches.length >= count) return matches
      Thread.sleep(10)
    }
    events.filter(predicate)
  }

  def dump(): String = events.map(e => s"${e.timestampMs} ${e.shardId} ${e.eventType}").mkString("\n")
}
