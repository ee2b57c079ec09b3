package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.KRecord

/** Builds the offline stand-in stream from the `events` table: rows are
  * hashed to shards by `user_id` (the partition key — Kinesis semantics:
  * same key → same shard → ordered), ordered within a shard by
  * `(ts, event_id)`, with zero-padded `event_id` as the sequence number.
  *
  * The collect is driver-side by design: this materializes the MOCK service
  * (the analog of the reference's scripted `MockKinesisClient`) — it is the
  * test/offline harness, not the data path. The engine's scale path reads
  * through the DSv2 source whose readers pull per-shard slices; a production
  * deployment swaps in a network-backed [[SourceClient]].
  */
object EventStream {

  // The mock is immutable and STATELESS (cursor state lives in iterator
  // strings, the shard map is never mutated), so one build serves every
  // query against the same (path, shards) — s1 and s3 each drive the
  // engine over the same stream, and rebuilding the driver-side mock
  // (sort + collect + split) per query doubled the bench's stream-family
  // cost for no coverage gain.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), InMemorySourceClient]()

  def clientFromParquet(spark: SparkSession, eventsPath: String,
      numShards: Int = 8): InMemorySourceClient =
    memo.computeIfAbsent((eventsPath, numShards),
      _ => buildClientFromParquet(spark, eventsPath, numShards))

  private def buildClientFromParquet(spark: SparkSession, eventsPath: String,
      numShards: Int): InMemorySourceClient = {
    import spark.implicits._
    // normalizeEventTs pins ts to the epoch-nanos BIGINT contract across
    // parquet vintages (TIMESTAMP(NANOS)-as-long vs native TIMESTAMP(MICROS))
    val rows = graft.analytics.Tables.normalizeEventTs(spark.read.parquet(eventsPath))
      .select(
        format_string("%016d", col("event_id")).as("sequenceNumber"),
        col("user_id").cast("string").as("partitionKey"),
        encode(concat_ws("|", col("event_type"), col("value").cast("string"), col("props")), "UTF-8")
          .as("data"),
        // ts is an epoch-NANOS long (normalizeEventTs contract); a numeric
        // `.cast("timestamp")` would interpret the value as SECONDS, so go
        // through timestamp_micros on ts/1000 instead.
        timestamp_micros(expr("ts div 1000")).as("approximateArrivalTimestamp"),
        concat(lit("shard-"), pmod(col("user_id"), lit(numShards)).cast("string")).as("shardId"),
        col("ts").as("ord"))
      .orderBy(col("shardId"), col("ord"), col("sequenceNumber"))
      .as[(String, String, Array[Byte], Option[java.sql.Timestamp], String, Long)]
      .collect()
    // rows arrive pre-sorted by (shard, ord, seq) — Spark does the sort
    // distributed; the driver only splits consecutive runs (a driver-side
    // groupBy+sortBy was the dominant cost of the mock at 10M+ records)
    val shards = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[KRecord]]
    rows.foreach { case (seq, pk, data, ts, shard, _) =>
      shards.getOrElseUpdate(shard, scala.collection.mutable.ArrayBuffer.empty)
        .append(KRecord(seq, pk, data, ts, shard))
    }
    new InMemorySourceClient(shards.view.mapValues(_.toIndexedSeq).toMap)
  }
}
