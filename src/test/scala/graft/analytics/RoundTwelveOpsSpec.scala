package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the round-12 operators, each pinned against an
  * INDEPENDENT derivation (the RoundTen/Eleven discipline — plain
  * collections, no Spark SQL, no DuckDB):
  *
  * - e18's BQ + re-rank must equal a from-scratch in-memory replay of
  *   the whole index (per-dim min/max, midrange bit tests, two packed
  *   32-bit words, Hamming top-32, exact-cosine re-rank), and every
  *   returned neighbor must live in its probe's Hamming candidate cut
  *   (the coarse stage actually cut).
  * - e19's recall legs must equal plain-Scala intersections of the
  *   registered e1/e18 outputs with the replayed raw-Hamming top-5.
  * - q57's funnel must equal a per-user first-touch chain folded by
  *   hand, and the reached-users counts must be monotone down the steps.
  * - m11's alignment must equal an in-memory replay of both decode legs
  *   plus a floor-arithmetic as-of, and every align_gap must sit in
  *   [0, 16) — the tumbling-window phase bound.
  */
class RoundTwelveOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val emb: Map[Long, Array[Double]] = spark.read
    .parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding").collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  /** From-scratch BQ index: midrange thresholds off per-dim extrema, two
    * packed 32-bit words per vector. */
  private lazy val bqWords: Map[Long, (Long, Long)] = {
    val dims = emb.head._2.length
    val th = (0 until dims).map { i =>
      val xs = emb.valuesIterator.map(_(i))
      val (mn, mx) = xs.foldLeft((Double.MaxValue, Double.MinValue)) {
        case ((a, b), x) => (math.min(a, x), math.max(b, x))
      }
      (mn + mx) / 2.0
    }
    emb.map { case (id, v) =>
      var w0 = 0L; var w1 = 0L
      var i = 0
      while (i < dims) {
        if (v(i) > th(i)) {
          if (i < 32) w0 |= 1L << i else w1 |= 1L << (i - 32)
        }
        i += 1
      }
      id -> (w0, w1)
    }
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Long =
    (java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)).toLong

  /** Raw Hamming top-k per probe, (hamming, id) tie-break. */
  private def hammingTopK(k: Int): Map[Long, Seq[(Long, Long, Long)]] =
    emb.keys.filter(_ < 8).map { p =>
      val ranked = emb.keys.filter(_ != p).toSeq
        .map(n => (hamming(bqWords(p), bqWords(n)), n))
        .sortBy(identity).take(k).zipWithIndex
        .map { case ((h, n), r) => (n, (r + 1).toLong, h) }
      p -> ranked
    }.toMap

  test("e18 equals a from-scratch in-memory BQ replay; the coarse cut holds") {
    val coarse = hammingTopK(32)
    val expected = coarse.toSeq.flatMap { case (p, cand) =>
      cand.map { case (n, cr, h) => (p, n, cos(emb(p), emb(n)), cr, h) }
        .sortBy { case (_, n, c, _, _) => (-c, n) }.take(5).zipWithIndex
        .map { case ((_, n, _, cr, h), r) => (p, n, (r + 1).toLong, cr, h) }
    }.sortBy { case (p, _, r, _, _) => (p, r) }
    val got = Similarity.binaryQuantTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe expected
    // pruning pin: every returned neighbor is inside its probe's cut
    val cutSets = coarse.map { case (p, c) => p -> c.map(_._1).toSet }
    got.foreach { case (p, n, _, _, _) => cutSets(p) should contain(n) }
  }

  test("e19 equals plain-Scala intersections of the legs' outputs") {
    val brute = Similarity.bruteCosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = hammingTopK(5).toSeq.flatMap { case (p, c) =>
      c.map { case (n, _, _) => (p, n) }
    }.toSet
    val reranked = Similarity.binaryQuantTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brute.groupBy(_._1).map { case (p, truth) =>
      (p, truth.count(raw.contains).toLong,
        truth.count(reranked.contains).toLong)
    }.toSeq.sortBy(_._1)
    val got = Similarity.bqRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    // the refine tier must never LOSE recall vs the raw 1-bit ranking
    got.foreach { case (_, bq, rr) => rr should be >= bq }
  }

  test("q57 equals a hand-folded first-touch chain; steps shrink") {
    // Tables.events pins ts to epoch-nanos BIGINT regardless of the file
    // vintage; div 1000 is the engine-wide micros rule (q17)
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 as tus")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t1 = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val t2 = t1.flatMap { case (u, a) =>
      val cs = ev.filter(e => e._1 == u && e._2 == "click" && e._3 > a)
      if (cs.isEmpty) None else Some(u -> (a, cs.map(_._3).min))
    }
    val t3 = t2.flatMap { case (u, (_, b)) =>
      val ps = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 > b)
      if (ps.isEmpty) None else Some(u -> (b, ps.map(_._3).min))
    }
    val expected = Seq(
      (1L, t1.size.toLong, 0L),
      (2L, t2.size.toLong, t2.valuesIterator.map { case (a, b) => b - a }.sum),
      (3L, t3.size.toLong, t3.valuesIterator.map { case (b, c) => c - b }.sum))
    val got = ExtendedQueries.q57Funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    got.map(_._2) shouldBe got.map(_._2).sorted.reverse
  }

  test("q58 equals a hand-folded median + lowest-tie mode") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.groupBy(_._1).map { case (t, xs) =>
      val vs = xs.map(_._3).sorted
      val med = if (vs.length % 2 == 1) vs(vs.length / 2)
        else (vs(vs.length / 2 - 1) + vs(vs.length / 2)) / 2.0
      val byUser = xs.groupBy(_._2).view.mapValues(_.length)
      val top = byUser.toSeq.minBy { case (u, c) => (-c, u) }._1
      (t, xs.length.toLong, med, top)
    }.toSeq.sortBy(_._1)
    val got = ExtendedQueries.q58MedianMode(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    got shouldBe expected
  }

  test("t25 equals a hand-folded frequency spectrum + exact OLS; flags synthetic text") {
    def log2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val counts = ds.flatMap(_._2.toLowerCase.split(" ", -1))
        .groupBy(identity).view.mapValues(_.length.toLong)
      val spectrum = counts.values.groupBy(log2).view
        .mapValues(cs => (cs.size.toLong, cs.sum)).toSeq
      val pts = spectrum.map { case (b, (types, _)) => (b, log2(types)) }
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      (lang, counts.size.toLong, spectrum.map(_._2._2).sum, n,
        n * sxy - sx * sy, n * sxx - sx * sx)
    }.toSeq.sortBy(_._1)
    val got = TextAnalytics.zipfAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe expected
    // detection pin: natural text's spectrum FALLS with the octave
    // (slope ≈ −1 at Zipf α ≈ 1); this driver corpus is TEMPLATED
    // synthetic text — a small vocabulary where most types are
    // high-count — so its spectrum RISES, and the audit must flag
    // exactly that (a positive slope on every language, both here and
    // at sf0.01). The operator exists to catch this data shape before
    // training compute is spent on it.
    got.foreach { case (_, _, _, _, num, den) =>
      den should be > 0L
      num should be > 0L
    }
  }

  test("f11 equals a hand-folded per-user totals/purchases join") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.length.toLong, xs.count(_._2 == "purchase").toLong)
    }.toSeq.sortBy(_._1)
    val got = FormatQueries.f11BucketedJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  test("m11 equals an in-memory two-leg replay with floor-arithmetic as-of") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._1 % 3 == 2)
    val expected = docs.flatMap { case (id, text, nChars) =>
      val payload = text.getBytes("UTF-8")
      val nf = math.min(8L, math.max(1L, nChars * 40 / 1000)).toInt
      val fb = payload.length / nf
      val luma = (0 until nf).map { f =>
        (f * fb until (f + 1) * fb).map(i => (payload(i) & 0xFF).toLong).sum
      }
      val windows = (0 until payload.length by 16).map { off =>
        val end = math.min(off + 16, payload.length)
        (off / 16, (off until end).map { i =>
          val v = (payload(i) & 0xFF).toLong; v * v
        }.sum)
      }
      (1 until nf).flatMap { f =>
        if (math.abs(luma(f) - luma(f - 1)) * 50 > luma(f) + luma(f - 1)) {
          val off = f.toLong * fb
          val wi = (off / 16).toInt
          if (wi < windows.length)
            Some((id, f.toLong, off, wi.toLong, off - wi * 16L,
              windows(wi)._2))
          else None
        } else None
      }
    }.sortBy { case (id, f, _, _, _, _) => (id, f) }.toSeq
    val got = Multimodal.avAlign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe expected
    // the 2% sensitivity must actually fire on this corpus — a vacuous
    // empty gate proves nothing (the 25% shot-cut rule never trips here)
    got should not be empty
    // tumbling-window phase bound: a cut is never more than one window
    // length past its aligned window's start
    got.foreach { case (_, _, _, _, gap, _) =>
      gap should be >= 0L
      gap should be < 16L
    }
  }
}
