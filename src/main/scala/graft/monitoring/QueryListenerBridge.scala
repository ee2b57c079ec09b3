package graft.monitoring

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Bridges Spark's streaming listener bus into the engine's event model
  * (SURVEY §2.6 maps M1/M3 to `StreamingQueryListener` + the event ADT):
  * every query progress becomes a BatchMetrics event per source, query
  * termination becomes a ShardEvent(Completed|Error). Spark's listener bus
  * is already non-blocking (M3's contract).
  *
  * Attach with `spark.streams.addListener(new QueryListenerBridge(sink))`.
  */
final class QueryListenerBridge(sink: EventSink, streamName: String = "*")
    extends StreamingQueryListener {

  private def now: Long = System.currentTimeMillis()

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    sink.emit(ProcessingEvent(now, streamName,
      ProcessingEventType.ShardEvent(ShardEventType.Started, Some(event.name))))

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    sink.emit(ProcessingEvent(now, streamName,
      ProcessingEventType.BatchMetrics(BatchMetricsSnapshot(
        recordCount = p.numInputRows,
        successfulCount = p.numInputRows,
        failedCount = 0,
        durationMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)))))
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    sink.emit(ProcessingEvent(now, streamName,
      event.exception match {
        case Some(err) => ProcessingEventType.ShardEvent(ShardEventType.Error, Some(err))
        case None => ProcessingEventType.ShardEvent(ShardEventType.Completed, None)
      }))
}
