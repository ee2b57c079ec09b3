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

  test("s24 change feed equals an in-memory running-state replay") {
    // replay: per event-time drop k, per-user drop winner classified
    // against the running LWW state BEFORE the drop applies
    var state = Map.empty[Long, (Long, Long, String, String, Double)]
    val expect = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, String, Double, String, Double)]
    (0L to 5L).foreach { k =>
      val drop = rows.filter(_._2 == k)
      val bw = drop.groupBy(_._1).map { case (u, xs) =>
        val w = xs.maxBy { case (_, _, tsu, eid, _, _, _) => (tsu, eid) }
        u -> (w._3, w._4, w._5, w._6, w._7) // (tsu, eid, op, type, value)
      }
      bw.toSeq.sortBy(_._1).foreach { case (u, (tsu, eid, op, et, v)) =>
        val old = state.get(u)
        val newWins = old.forall(o =>
          Ordering[(Long, Long)].gt((tsu, eid), (o._1, o._2)))
        val oldVis = old.exists(_._3 == "u")
        val newVis = op == "u"
        val (ot, ov) = if (oldVis) (old.get._4, old.get._5) else ("", 0.0)
        val (nt, nv) = if (newVis) (et, v) else ("", 0.0)
        val change =
          if (newWins && !oldVis && newVis) Some("added")
          else if (newWins && oldVis && !newVis) Some("deleted")
          else if (newWins && oldVis && newVis && (ot != nt || ov != nv))
            Some("updated")
          else None
        change.foreach(c => expect += ((k, c, u, ot, ov, nt, nv)))
        if (newWins) state = state.updated(u, (tsu, eid, op, et, v))
      }
    }
    val got = StreamingQueries.s24StreamChangeFeed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5), r.getDouble(6)))
    got.toSeq shouldBe expect.toSeq
      .sortBy { case (ver, _, u, _, _, _, _) => (ver, u) }
    // non-degenerate: the feed must exercise all three transition kinds
    got.map(_._2).distinct.sorted shouldBe Seq("added", "deleted", "updated")
  }

  test("e22 equals a hand brute-force range scan (pruning is exact)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = emb.keys.filter(_ < 8).toSeq.sorted.map { p =>
      val hits = emb.keys.filter(n => n != p && cos(emb(p), emb(n)) >= 0.3)
        .toSeq.sorted
      (p, hits.size.toLong, hits.sum,
        hits.foldLeft(0L)(_ ^ _),
        if (hits.isEmpty) -1L else hits.min,
        if (hits.isEmpty) -1L else hits.max)
    }
    val got = Similarity.rangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    got.toSeq shouldBe expect
    // the range statistic is non-degenerate on this corpus: at least one
    // probe has hits, else the spec proves nothing about the pruning
    expect.map(_._2).sum should be > 0L
  }

  test("d15 equals an in-memory md5-minhash replay; the S-curve has shape") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 256").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(ws: Seq[String]): Set[String] =
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty
    def h(k: Int, x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((k + "|" + x).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def sig(sh: Set[String]): IndexedSeq[Long] =
      (0 until 16).map(k => sh.iterator.map(x => h(k, x)).min)
    val buckets = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      .withDefaultValue((0L, 0L))
    for {
      (_, text) <- docs
      ws = text.toLowerCase.replaceAll("\\s+", " ").split(" ", -1).toSeq
      if ws.length >= 3
      p <- 1 to 9
    } {
      val cut = math.max(3, math.floor(ws.length * p / 10.0).toInt)
      val sha = shingles(ws.take(cut))
      val shb = shingles(ws)
      if (sha.nonEmpty && shb.nonEmpty) {
        val j = (sha & shb).size.toDouble / (sha | shb).size
        val b = math.min(9L, math.floor(j * 10).toLong)
        val sa = sig(sha); val sb = sig(shb)
        val coll = (0 until 4).exists(bb =>
          sa.slice(bb * 4, bb * 4 + 4) == sb.slice(bb * 4, bb * 4 + 4))
        val (n, c) = buckets(b)
        buckets(b) = (n + 1, c + (if (coll) 1L else 0L))
      }
    }
    val expect = buckets.toSeq.sortBy(_._1).map { case (b, (n, c)) =>
      (b, n, c, c * 1000000L / n)
    }
    val got = NearDup.lshCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe expect
    // curve shape: graded truncation populates most deciles, and the
    // collision rate climbs from starved to saturated across them
    got.length should be >= 6
    got.head._4 should be < 100000L // bottom decile: LSH nearly never fires
    got.last._4 should be > 900000L // top decile: effectively certain
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
