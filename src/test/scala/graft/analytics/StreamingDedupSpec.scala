package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Streaming exact dedup: duplicates within the watermark horizon are
  * dropped with BOUNDED state (dropDuplicatesWithinWatermark on the content
  * hash) — the continuous-ingest side of the d1/d2 batch dedup family. */
class StreamingDedupSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("duplicates within the watermark are dropped across micro-batches; state stays bounded") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = Dedup.streamingDedup(
      input.toDS().toDF("id", "text", "ts"), tsCol = "ts", textCol = "text",
      watermark = "30 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // same text twice in one batch (whitespace-normalized dup) + once more
      // in the next batch, still inside the watermark → ONE survivor
      input.addData((1L, "the quick fox", ts(0)), (2L, "the  QUICK   fox", ts(1)),
        (3L, "something else", ts(2)))
      q.processAllAvailable()
      input.addData((4L, "the quick fox", ts(5)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id FROM sdedup ORDER BY id").collect().map(_.getLong(0))
      // exactly one of the duplicate trio (1/2/4) survives — WHICH in-batch
      // copy wins is unspecified by dropDuplicates; the later batch's id=4
      // must never appear (its hash is in state)
      rows should have length 2
      rows should contain(3L)
      rows.count(Set(1L, 2L)) shouldBe 1
      rows should not contain 4L
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sdedup")
    }
  }
}
