package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the round-11 third-batch operators, each pinned against
  * an INDEPENDENT derivation (plain collections, no Spark, no SQL):
  *
  * - e17's graph ANN must equal a from-scratch in-memory replay of the
  *   whole search — per-probe coarse-centroid entry, 3 rounds of
  *   beam ∪ neighbors re-ranked to width 8, exact top-5 of the surviving
  *   beam — over the SAME edge set (e9's reciprocal graph, itself
  *   oracle-gated), and the candidate volume each probe ever touches
  *   must stay bounded by beam·(k+1)·hops — the defining graph-ANN
  *   property the brute/IVF members don't have.
  * - t24's tercile filter must equal hand-rolled ntile(3) arithmetic
  *   over t22's (independently pinned) per-doc scores.
  */
class RoundElevenCOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("e17 equals a from-scratch in-memory beam-search replay; candidate volume is corpus-independent") {
    val emb: Map[Long, Array[Double]] = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // the same edge set the operator searches (e9's reciprocal graph —
    // itself hash-gated against its own DuckDB oracle), symmetrized
    val recPairs = Similarity.knnGraphTwoLevelSelfScaled(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Seq[Long]] =
      (recPairs ++ recPairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    val side = Similarity.sideFor(emb.size.toLong)
    val coarseNodes = emb.keys.filter(v => v % 31 == 0 && v < 31L * side)
      .toSeq.sorted
    val probes = emb.keys.filter(_ < 8).toSeq.sorted
    var touched = 0
    val exp = probes.flatMap { p =>
      val pv = emb(p)
      val entry = coarseNodes.minBy(n => (-cos(pv, emb(n)), n))
      var beam = Seq(entry)
      (1 to 3).foreach { _ =>
        val cand = (beam ++ beam.flatMap(n => adj.getOrElse(n, Nil))).distinct
        touched += cand.size
        beam = cand.sortBy(n => (-cos(pv, emb(n)), n)).take(8)
      }
      beam.filter(_ != p).sortBy(n => (-cos(pv, emb(n)), n)).take(5)
        .zipWithIndex.map { case (n, i) => (p, n, (i + 1).toLong) }
    }.toSet
    val got = Similarity.graphAnnTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe exp
    got.size should be > 0
    // graph-ANN's defining bound: candidates per probe per hop ≤
    // beam·(maxdeg+1); with the reciprocal graph's k=3 cap, maxdeg ≤ 3,
    // so the whole search touches ≤ 8·4·3 nodes per probe regardless of
    // corpus size
    touched should be <= probes.size * 8 * 4 * 3
    // ranks are contiguous from 1 within each probe
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._3).toSeq.sorted shouldBe (1L to rows.size.toLong)
    }
  }

  test("t24 equals hand-rolled per-source ntile(3) arithmetic over t22's scores") {
    val scores = TextAnalytics.knSurprisal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val src: Map[Long, String] = spark.read
      .parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = scores.groupBy(t => src(t._1)).flatMap { case (source, docs) =>
      val ordered = docs.sortBy(t => (t._3, t._1))
      val n = ordered.length
      val base = n / 3; val rem = n % 3
      val bucketed = ordered.zipWithIndex.map { case (doc, i) =>
        // SQL-standard ntile: the first `rem` buckets get base+1 rows
        val b =
          if (i < rem * (base + 1)) i / (base + 1) + 1
          else (i - rem * (base + 1)) / base + rem + 1
        (b.toLong, doc)
      }
      bucketed.groupBy(_._1).map { case (b, rows) =>
        (source, b, rows.length.toLong, rows.map(_._2._2).sum,
          rows.map(_._2._3).min, rows.map(_._2._3).max,
          if (b <= 2) 1L else 0L)
      }
    }.toSet
    val got = TextAnalytics.perplexityFilter(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    got shouldBe exp
    // every source splits into exactly 3 buckets, head sizes ≥ tail sizes
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).toSeq.sorted shouldBe Seq(1L, 2L, 3L)
      val byB = rows.map(r => r._2 -> r._3).toMap
      byB(1L) should be >= byB(3L)
    }
  }

  test("f9 as-of reads equal a last-writer-wins replay at each cutoff; later deltas never leak") {
    val ev = graft.analytics.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 AS tsu", "event_id",
        "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max + 1
    val span = math.max(1L, (hi - lo + 5) / 6)
    def stateAt(cutoff: Long) = ev.filter(_._2 < cutoff)
      .groupBy(_._1).flatMap { case (uid, rows) =>
        val w = rows.maxBy(r => (r._2, r._3))
        if (w._4 == "error") None else Some((uid, w._4, w._5))
      }
    val exp = (stateAt(lo + 4 * span).map(t => (3L, t._1, t._2, t._3)) ++
      stateAt(hi).map(t => (5L, t._1, t._2, t._3))).toSet
    val got = FormatQueries.f9SnapshotRead(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    got shouldBe exp
    // time travel is real: the two snapshots genuinely differ (version 3
    // must not see version-4/5 activity)
    got.filter(_._1 == 3L).map(t => (t._2, t._3, t._4)) should not be
      got.filter(_._1 == 5L).map(t => (t._2, t._3, t._4))
  }

  test("m10 equals an in-memory energy-delta fingerprint replay; every clip pairs with its copy") {
    val clips = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(_.getLong(0) % 3 == 1)
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    def print0(bytes: Array[Byte]): (Long, Long) = {
      val nWin = (bytes.length + 15) / 16
      val e = new Array[Long](math.max(1, nWin))
      bytes.indices.foreach(i => e(i / 16) += {
        val v = (bytes(i) & 0xFF).toLong; v * v
      })
      val fp = (0 until math.min(62, nWin - 1)).foldLeft(0L) { (acc, w) =>
        if (e(w + 1) > e(w)) acc | (1L << w) else acc
      }
      (nWin.toLong, fp)
    }
    val prints = clips.flatMap { case (id, b) =>
      val (nw, fp) = print0(b); Seq((id, nw, fp), (id + 1000000L, nw, fp))
    }
    val exp = prints.groupBy(t => (t._2, t._3)).map { case ((nw, fp), vs) =>
      (vs.map(_._1).min, vs.size.toLong, nw, fp)
    }.toSet
    val got = Multimodal.audioDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    got shouldBe exp
    got.foreach { case (_, n, _, _) => n % 2 shouldBe 0L }
    got.size should be > 1
  }

  test("p22 allocations equal hand-rolled largest-remainder arithmetic and sum exactly to the phase budgets") {
    // per-source masses from t22's pinned scores + the t24 tercile replay
    val scores = TextAnalytics.knSurprisal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val src: Map[Long, String] = spark.read
      .parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val masses = scores.groupBy(t => src(t._1)).map { case (source, docs) =>
      val ordered = docs.sortBy(t => (t._3, t._1))
      val n = ordered.length
      val base = n / 3; val rem = n % 3
      val withB = ordered.zipWithIndex.map { case (doc, i) =>
        val b =
          if (i < rem * (base + 1)) i / (base + 1) + 1
          else (i - rem * (base + 1)) / base + rem + 1
        (b, doc._2)
      }
      val mainMass = withB.filter(_._1 <= 2).map(_._2).sum
      val headMass = withB.filter(_._1 == 1).map(_._2).sum
      (source, mainMass, headMass)
    }.toSeq.sortBy(_._1)
    val tm = masses.map(_._2).sum
    val th = masses.map(_._3).sum
    val annB = tm / 5; val mainB = tm - annB
    def hamilton(budget: Long, w: Seq[(String, Long)], tot: Long) = {
      val fl = w.map { case (s0, m) =>
        (s0, (budget * m) / tot, (budget * m) % tot)
      }
      val extra = budget - fl.map(_._2).sum
      val ranked = fl.sortBy(t => (-t._3, t._1)).zipWithIndex
      ranked.map { case ((s0, f, _), i) =>
        s0 -> (f + (if (i < extra) 1L else 0L))
      }.toMap
    }
    val wgts = masses.map(t => t._1 -> math.sqrt(t._2.toDouble).floor.toLong)
    val mainAlloc = hamilton(mainB, wgts, wgts.map(_._2).sum)
    val annAlloc = hamilton(annB, masses.map(t => t._1 -> t._3), th)
    val exp = masses.flatMap { case (s0, mm, hm) =>
      Seq(("main", s0, mm, mainAlloc(s0)), ("anneal", s0, hm, annAlloc(s0)))
    }.toSet
    val got = PipelineOps.p22CurriculumSchedule(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe exp
    // exact-budget invariants (toSeq first: mapping a Set would collapse
    // equal per-source allocations before the sum)
    got.toSeq.filter(_._1 == "main").map(_._4).sum shouldBe mainB
    got.toSeq.filter(_._1 == "anneal").map(_._4).sum shouldBe annB
  }

  test("the closed-form ntile(3) arithmetic equals the SQL-standard definition for every group size to 500") {
    // the Spark side of t24/p22 replaces the per-source ntile window with
    // p14's two-phase rank + this closed form; pin the closed form against
    // the standard definition (first n%3 buckets get one extra row) for
    // every group size the algebra could get wrong
    (1 to 500).foreach { n =>
      val base = n / 3; val rem = n % 3
      val standard = (1 to 3).flatMap(b =>
        Seq.fill(if (b <= rem) base + 1 else base)(b))
      (1 to n).foreach { r =>
        val closed =
          if (r <= rem * (base + 1)) (r - 1) / (base + 1) + 1
          else rem + (r - rem * (base + 1) - 1) / base + 1
        withClue(s"n=$n r=$r") { closed shouldBe standard(r - 1) }
      }
    }
  }
}
