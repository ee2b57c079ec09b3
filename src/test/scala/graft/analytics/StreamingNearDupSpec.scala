package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Streaming near-dup: incoming documents are flagged against a STATIC
  * corpus signature index via a stateless stream-static band join + exact
  * Jaccard verify — the incremental form of n1 for continuous ingest.
  * Candidate-pair dedup state is bounded by the watermark
  * (`dropDuplicatesWithinWatermark`), same discipline as streaming exact
  * dedup. */
class StreamingNearDupSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("arriving near-dup of a corpus doc is flagged; unrelated doc is not") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (200L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String, Timestamp)]
    val flagged = NearDup.streamingNearDup(
      input.toDS().toDF("doc_id", "text", "ts"), corpus, tsCol = "ts",
      watermark = "30 minutes")
    val q = flagged.writeStream.format("memory").queryName("sneardup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        // near-dup of corpus doc 100: one word changed → Jaccard well > 0.5
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota OMEGA", ts(0)),
        // unrelated: no shared 3-grams with either corpus doc
        (2L, "completely different words that never appeared before at all", ts(1)))
      q.processAllAvailable()
      // replay of the same doc inside the watermark → pair already deduped
      input.addData((1L, "alpha beta gamma delta epsilon zeta eta theta iota OMEGA", ts(5)))
      q.processAllAvailable()

      val rows = spark.sql("SELECT doc_id, match_id, jaccard FROM sneardup").collect()
      rows should have length 1
      rows.head.getLong(0) shouldBe 1L
      rows.head.getLong(1) shouldBe 100L
      rows.head.getDouble(2) should be >= 0.5
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sneardup")
    }
  }
}
