package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.engine.GraftProcessor
import graft.processor.RecordProcessor
import graft.sources.EventStream

/** The minimum end-to-end slice as a registered, oracle-checked query
  * (SURVEY §7 step 4): events.parquet → 8-shard KRecord stream → custom
  * micro-batch source → RecordProcessor decode → foreachBatch commit via
  * CheckpointStore → count-by-event_type, verified against the same
  * aggregation DuckDB computes on the static table. The whole streaming
  * path (S1-S4, T1/T3/T4, K1-K4, O1-O9) sits under this oracle. */
object StreamingQueries {

  /** Decodes the `"event_type|value|props"` payload and emits the event
    * type — the reference's doc example shape (UTF-8 decode in user code,
    * `src/lib.rs:95-113`). */
  final class EventTypeProcessor extends RecordProcessor[String] {
    override def processRecord(r: KRecord, m: RecordMetadata) = {
      val payload = r.dataUtf8
      val sep = payload.indexOf('|')
      if (sep <= 0) Left(ProcessingError.HardFailure(s"malformed payload: $payload"))
      else Right(Some(payload.substring(0, sep)))
    }
  }

  def streamCountByType(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream-q").toString
    val itemsDir = s"$tmp/items"
    val client = EventStream.clientFromParquet(spark, s"$sfDir/events.parquet", numShards = 8)
    val gp = new GraftProcessor[String](
      ProcessorConfig("events", batchSize = 500),
      new EventTypeProcessor,
      client,
      new InMemoryCheckpointStore,
      onItems = (ds, _) => ds.toDF("event_type").write.mode("append").parquet(itemsDir)
    )
    gp.run(spark, s"$tmp/ckpt") match {
      case Left(e) => throw e
      case Right(()) =>
        spark.read.parquet(itemsDir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy(col("event_type"))
    }
  }

  val streamCountOracle: String =
    "SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_stream_count_by_type" -> (streamCountByType _)
  )

  val oracles: Map[String, String] = Map(
    "s1_stream_count_by_type" -> streamCountOracle
  )
}
