package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Independent from-scratch replays for the round-14 addition (the
  * per-round convention: every new registered entry gets an in-JVM
  * re-derivation that shares NO code with the production path, beside
  * its DuckDB oracle).
  *
  * s25 (incremental materialized view from the change feed): the plain-
  * Scala replay folds the s24 feed's transitions with exact integer
  * cents — added ⇒ (+1, +cents(new)) on the new type, deleted ⇒
  * (−1, −cents(old)) on the old type, updated ⇒ both — and must equal
  * the registered query row-for-row; the structural pin proves the view
  * is maintained from the FEED alone (no join anywhere, no scan of the
  * events table in the plan). */
class RoundFourteenOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s25 materialized view equals a plain-Scala fold of the s24 feed") {
    val feed = StreamingQueries.s24StreamChangeFeed(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(3), r.getDouble(4),
        r.getString(5), r.getDouble(6))) // (change, old_type, old_v, new_type, new_v)
    def cents(v: Double): Long = math.round(v * 100)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def add(t: String, dn: Long, dv: Long): Unit = {
      val (n, s) = acc.getOrElse(t, (0L, 0L))
      acc(t) = (n + dn, s + dv)
    }
    feed.foreach {
      case ("added", _, _, nt, nv) => add(nt, 1L, cents(nv))
      case ("deleted", ot, ov, _, _) => add(ot, -1L, -cents(ov))
      case ("updated", ot, ov, nt, nv) =>
        add(ot, -1L, -cents(ov)); add(nt, 1L, cents(nv))
      case other => fail(s"unknown transition $other")
    }
    val expect = acc.toSeq.filter(_._2._1 > 0)
      .map { case (t, (n, s)) => (t, n, s) }.sortBy(_._1)
    val got = StreamingQueries.s25FeedMaterializedView(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expect
    // non-degenerate: several types, and at least one type whose count
    // moved both ways (updates/deletes occurred, not just adds)
    got.size should be >= 3
    feed.count(_._1 != "added") should be > 0
  }

  test("s25 is maintained from the feed ALONE: no join, no events scan in the plan") {
    val plan = StreamingQueries.s25FeedMaterializedView(spark, sf)
      .queryExecution.executedPlan.toString
    withClue(plan.take(1500)) {
      plan.toLowerCase should not include "join"
      plan should not include "events.parquet"
    }
  }
}
