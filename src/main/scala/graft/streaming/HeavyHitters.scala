package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming heavy hitters — continuous "top users per event type" over the
  * event stream, the standing leaderboard query every behavioral pipeline
  * runs. Exercises `MapState` (the keyed map-of-substate handle of Spark 4's
  * `transformWithState`; s13 covers `ValueState`): one exact
  * user → count map per (event_type, salt) group.
  *
  * Scale design: keying by event_type alone caps parallelism at the number
  * of types (5 here — a 1000-executor cluster would idle), so the state key
  * is SALTED with `user_id % nSalts`: each salted group holds an exact,
  * disjoint shard of the per-type counts, and RocksDB shards the maps
  * across executors. Each batch touches only the map entries of users seen
  * in that batch (point lookups + updates — never a full map iteration),
  * and emits the exact updated counts of exactly those users, so emission
  * volume is bounded by input volume and the LAST emission per (type, user)
  * is that user's exact final count. The drained top-k is then a batch fold
  * over final counts — any micro-batch placement yields the identical
  * result, which is what lets a streaming leaderboard hash-match a batch
  * oracle.
  */
object HeavyHitters {

  import Sessionize.UserEvent

  final case class TypeUserCount(eventType: String, userId: Long, n: Long)

  /** Exact per-(type-shard) user counts in one `MapState[Long, Long]`;
    * emits the updated count of every user touched by the batch. TTL ages
    * idle users out of the store (the bounded-state discipline; NONE for
    * the drain-to-batch gate where exactness is pinned). */
  final class TopKCountProcessor(ttl: TTLConfig)
      extends StatefulProcessor[(String, Long), UserEvent, TypeUserCount] {
    @transient private var counts: MapState[Long, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long]("counts",
        Encoders.scalaLong, Encoders.scalaLong, ttl)
    override def handleInputRows(key: (String, Long), rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[TypeUserCount] = {
      // fold the batch locally first: one state point-write per touched
      // user, not one per row
      val touched = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      rows.foreach { e =>
        touched.update(e.userId, touched.getOrElse(e.userId, 0L) + 1L)
      }
      val out = touched.map { case (uid, add) =>
        val c = (if (counts.containsKey(uid)) counts.getValue(uid) else 0L) + add
        counts.updateValue(uid, c)
        TypeUserCount(key._1, uid, c)
      }.toVector
      out.iterator
    }
  }

  /** Running exact per-(type, user) counts, salted `nSalts` ways. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` on the session. */
  def typeUserCounts(events: Dataset[UserEvent], nSalts: Long = 64L,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[TypeUserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.eventType, e.userId % nSalts))
      .transformWithState(new TopKCountProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
