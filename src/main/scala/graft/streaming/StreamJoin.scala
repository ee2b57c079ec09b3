package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the streaming counterpart of the batch
  * as-of attribution (`analytics/PipelineOps.p1AsofAttribution`): purchases
  * joined to the clicks that preceded them within a bounded lookback.
  *
  * Stream-stream joins need BOTH a watermark on each side and a time-range
  * join condition; together they let Spark bound the join state (clicks
  * older than `purchaseTs − lookback − watermark` are evicted) instead of
  * buffering either stream forever — the property that keeps this runnable
  * as a continuous 100 TB/day pipeline. Interval-join semantics: every
  * qualifying click per purchase (the batch p1 refines to latest-only; an
  * append-mode stream-stream join cannot argmax per key without a second
  * stateful stage).
  */
object StreamJoin {

  final case class Click(cUser: Long, clickId: Long, clickTs: Timestamp)
  final case class Purchase(pUser: Long, purchaseId: Long, purchaseTs: Timestamp)

  private def joinImpl(
      clicks: Dataset[Click],
      purchases: Dataset[Purchase],
      lookback: String,
      watermark: String,
      joinType: String): DataFrame = {
    val c = clicks.withWatermark("clickTs", watermark)
    val p = purchases.withWatermark("purchaseTs", watermark)
    p.join(c,
        col("cUser") === col("pUser") &&
          col("clickTs") <= col("purchaseTs") &&
          col("clickTs") >= col("purchaseTs") - expr(s"INTERVAL $lookback"),
        joinType)
      .select(col("purchaseId"), col("pUser").as("userId"), col("clickId"),
        (unix_millis(col("purchaseTs")) - unix_millis(col("clickTs"))).as("gap_ms"))
  }

  /** Inner interval join: all clicks by the same user in
    * (purchaseTs − lookback, purchaseTs]. Output includes the click→purchase
    * gap in ms. */
  def attributionJoin(
      clicks: Dataset[Click],
      purchases: Dataset[Purchase],
      lookback: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    joinImpl(clicks, purchases, lookback, watermark, "inner")

  /** Stream-static enrichment: a streaming Dataset joined to a static
    * (batch) dimension frame. The static side re-plans per micro-batch and
    * broadcasts under the usual threshold — no streaming state at all, the
    * cheapest join shape there is. Use for dimension lookups on a live
    * stream (the Kinesis-processor analog: decorating records with
    * reference data inside process_record, but declarative and
    * broadcast-planned). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), key)

  /** Left-outer variant: purchases with NO qualifying click still emit (null
    * click columns) once the watermark passes the end of their join window —
    * the "unattributed conversions" feed. Same state-eviction bounds. */
  def attributionJoinOuter(
      clicks: Dataset[Click],
      purchases: Dataset[Purchase],
      lookback: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    joinImpl(clicks, purchases, lookback, watermark, "left_outer")
}
