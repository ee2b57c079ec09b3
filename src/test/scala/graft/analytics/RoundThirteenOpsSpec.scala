package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Independent from-scratch replays for the round-13 additions — the
  * RoundTwelveOpsSpec discipline: every new operator is pinned against
  * a hand-rolled derivation that shares NO code with the
  * implementation, plus its structural scale claims.
  */
class RoundThirteenOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The f9/f12 build replayed by hand: (user, delta, tsu, event_id,
    * op, type, value) under the 6-batch event-time cutoff rule. */
  private lazy val rows: Seq[(Long, Long, Long, Long, String, String, Double)] = {
    val ev = graft.analytics.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val lo = ev.map(_._2).min
    val hi = ev.map(_._2).max + 1
    val span = math.max(1L, (hi - lo + 5) / 6)
    ev.toSeq.map { case (u, tsu, eid, et, v) =>
      (u, math.min(5L, (tsu - lo) / span), tsu, eid,
        if (et == "error") "d" else "u", et, v)
    }
  }

  /** Per-user LWW winner over deltas <= k: max by (tsu, event_id) —
    * the engine's struct-argmax sequence order. */
  private def winners(k: Long): Map[Long, (String, String, Double)] =
    rows.filter(_._2 <= k).groupBy(_._1).map { case (u, xs) =>
      val w = xs.maxBy { case (_, _, tsu, eid, _, _, _) => (tsu, eid) }
      u -> (w._5, w._6, w._7)
    }

  test("f12 equals a hand-derived two-snapshot diff; the plan is join-free") {
    val w3 = winners(3L)
    val w5 = winners(5L)
    val expect = (w3.keySet ++ w5.keySet).toSeq.flatMap { u =>
      val p3 = w3.get(u).exists(_._1 == "u")
      val p5 = w5.get(u).exists(_._1 == "u")
      val (ot, ov) = if (p3) (w3(u)._2, w3(u)._3) else ("", 0.0)
      val (nt, nv) = if (p5) (w5(u)._2, w5(u)._3) else ("", 0.0)
      val change =
        if (!p3 && p5) Some("added")
        else if (p3 && !p5) Some("deleted")
        else if (p3 && p5 && (ot != nt || ov != nv)) Some("updated")
        else None
      change.map(c => (c, u, ot, ov, nt, nv))
    }.sortBy { case (c, u, _, _, _, _) => (c, u) }
    val df = FormatQueries.f12SnapshotDiff(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getString(2), r.getDouble(3), r.getString(4), r.getDouble(5)))
    got.toSeq shouldBe expect
    expect should not be empty
    // structural claim: ONE aggregate, ZERO joins (the conditional
    // double-argmax replaces the naive two-snapshot full-outer join)
    val plan = FormatQueries.f12SnapshotDiff(spark, sf)
      .queryExecution.executedPlan.toString
    withClue(plan.take(1500)) {
      plan.toLowerCase should not include "join"
    }
  }

  test("g3/q59 share ONE staged co-purchase fold per (JVM, dataset)") {
    StageCache.invalidate()
    // first toucher builds the stage; the sibling must NOT rebuild —
    // pin via the stage dir identity (same parquet path on both reads)
    val dir1 = GraphOps.coPurchaseStageDir(spark, sf)
    val dir2 = GraphOps.coPurchaseStageDir(spark, sf)
    dir1 shouldBe dir2
    // and both registered consumers run green off the shared stage
    ExtendedQueries.q59AssocRules(spark, sf).count() should be >= 1L
    GraphOps.triangleCount(spark, sf).count() shouldBe 1L
    // the staged order total is the real one, not a stale artifact
    val n = GraphOps.coPurchaseOrderTotal(spark, sf)
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").distinct().count()
    n shouldBe direct
  }
}
