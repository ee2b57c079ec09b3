package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import StreamJoin.{Click, Purchase}

/** Stream-stream interval join: inner matches within the lookback window
  * only, and the left-outer variant emits unmatched purchases (null click)
  * after the watermark closes their window. */
class StreamJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("inner interval join matches clicks within the lookback window only") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = StreamJoin.attributionJoin(
        clicks.toDS(), purchases.toDS(), lookback = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: clicks at 0 and 50; purchase at 60 → only the 50min click
      // is inside the 30min lookback. user 2: click after the purchase →
      // no match ever.
      clicks.addData(Click(1, 100, ts(0)), Click(1, 101, ts(50)), Click(2, 200, ts(70)))
      purchases.addData(Purchase(1, 900, ts(60)), Purchase(2, 901, ts(65)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT purchaseId, userId, clickId, gap_ms FROM attrib ORDER BY purchaseId, clickId")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.toSeq shouldBe Seq((900L, 1L, 101L, 10L * 60000L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS attrib")
    }
  }

  test("stream-static enrichment broadcasts the dimension, no streaming state") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cUser", "tier")
    val q = StreamJoin.enrich(clicks.toDS().toDF(), dim, "cUser")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      clicks.addData(Click(1, 100, ts(1)), Click(2, 200, ts(2)), Click(3, 300, ts(3)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT clickId, tier FROM enriched ORDER BY clickId")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // user 3 has no dim row → dropped by the inner join
      rows.toSeq shouldBe Seq((100L, "gold"), (200L, "silver"))
      val plan = q.lastProgress.sources.length
      plan shouldBe 1 // single streaming source; the dim side is static
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS enriched")
    }
  }

  test("left-outer join emits unattributed purchases with null click after the watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = StreamJoin.attributionJoinOuter(
        clicks.toDS(), purchases.toDS(), lookback = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      clicks.addData(Click(1, 100, ts(55)))
      purchases.addData(Purchase(1, 900, ts(60)), Purchase(3, 902, ts(60)))
      q.processAllAvailable()
      // advance both watermarks far past purchase 902's window so the
      // unmatched row can be finalized as (902, null)
      clicks.addData(Click(99, 999, ts(500)))
      purchases.addData(Purchase(99, 998, ts(500)))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT purchaseId, clickId FROM attrib_outer WHERE purchaseId IN (900, 902) ORDER BY purchaseId")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      rows.toSeq shouldBe Seq((900L, 100L), (902L, -1L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS attrib_outer")
    }
  }
}
