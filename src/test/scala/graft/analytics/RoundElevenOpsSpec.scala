package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the round-11 retrieval operators, each pinned against
  * an INDEPENDENT derivation (the RoundTenOpsSpec discipline):
  *
  * - t20's exact-BIGINT BM25 (bit-length integer log + six exact
  *   squarings for six fractional idf bits + 1/2¹⁰ tf-saturation) must
  *   equal a from-scratch in-memory Scala replay of the same integer
  *   recurrence — no Spark, no SQL, plain collections.
  * - e14's RRF fusion must equal fusing the two legs' own registered
  *   outputs with the integer RRF formula in plain Scala.
  */
class RoundElevenOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The staged idf: ⌊64·log₂(n/df)⌋ up to deterministic 10-bit mantissa
    * truncation — integer part from bit length, six fractional bits from
    * six exact squarings. */
  private def idfQ64(n: Long, df: Long): Long = {
    val ib = 63 - java.lang.Long.numberOfLeadingZeros(n / df)
    var m = (n * 1024L) / (df << ib)
    var a = 0L
    (1 to 6).foreach { _ =>
      val m2 = m * m
      if (m2 >= 2097152L) { a = 2 * a + 1; m = m2 / 2048 }
      else { a = 2 * a; m = m2 / 1024 }
    }
    64L * ib + a
  }

  private def bm25Replay(): Map[(Long, Long), (Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
      .toMap
    val tf: Map[(Long, String), Long] = docs.toSeq
      .flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dl: Map[Long, Long] = docs.map { case (id, ws) => id -> ws.size.toLong }
    val n = docs.size.toLong
    val aSum = dl.values.sum
    val dfm: Map[String, Long] = tf.keys.toSeq.map(_._2)
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val rq: Map[Long, Long] = dl.map { case (id, l) => id -> (l * n * 1024L) / aSum }
    val out = for {
      probe <- (0L until 5L)
      terms = docs(probe).distinct
      // candidates = docs sharing ≥1 term with the probe (the posting
      // join's semantics) — a shared-term doc with score 0 still competes
      scored = docs.keys.filter(_ != probe)
        .filter(d => terms.exists(t => tf.contains((d, t)))).map { d =>
          val s = terms.map { t =>
            tf.get((d, t)).fold(0L) { f =>
              idfQ64(n, dfm(t)) * ((22528L * f * 1024L) / (10240L * f + 3072L + 9L * rq(d)))
            }
          }.sum
          d -> s
        }.toSeq
      ((d, s), i) <- scored.sortBy { case (d, s) => (-s, d) }.zipWithIndex.take(10)
    } yield (probe, d) -> (s, i + 1L)
    out.toMap
  }

  test("t20 equals a from-scratch in-memory integer-BM25 replay") {
    val got = TextAnalytics.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val exp = bm25Replay()
    got shouldBe exp
    // the staged idf must discriminate on this corpus (the integer-log
    // formulation scored 0 everywhere — the bug class this spec pins out)
    got.values.map(_._1).max should be > 0L
  }

  test("e14 equals fusing the two legs' own registered outputs in plain Scala") {
    val lex = TextAnalytics.bm25TopK(spark, sf, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // vector leg at fusion width via the same public brute-force entry
    // (its probe set 0..7 is a superset of the fusion probes 0..4)
    val vec = Similarity.bruteCosineTopK(spark, sf, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .filter(_._1._1 < 5L).toMap
    val fused: Map[(Long, Long), (Long, Long)] =
      (lex.keySet ++ vec.keySet).groupBy(_._1).toSeq.flatMap { case (_, ks) =>
        val scored = ks.toSeq.map { k =>
          val s = lex.get(k).fold(0L)(r => 1048576L / (60L + r)) +
            vec.get(k).fold(0L)(r => 1048576L / (60L + r))
          val legs = lex.contains(k).compare(false) + vec.contains(k).compare(false)
          (k, s, legs.toLong)
        }
        scored.sortBy { case ((_, id), s, _) => (-s, id) }.take(10)
          .map { case (k, s, legs) => k -> (s, legs) }
      }.toMap
    val got = Similarity.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    got.keySet shouldBe fused.keySet
    got.foreach { case (k, (s, legs)) =>
      (s, legs) shouldBe fused(k)
    }
    // both modalities must actually contribute
    got.values.map(_._2).toSet should contain (2L)
  }

  /** t21's independent derivation: the TEXTBOOK sequential BPE trainer —
    * mutable greedy-left skip-2 scan per word — versus the registered
    * query's positional run-parity rewrite. Same merges, two formulations. */
  private def bpeReplay(iters: Int): Seq[(Long, String, String, String, Long)] = {
    var seqs: Seq[(Vector[String], Long)] = spark.read
      .parquet(s"$sf/documents.parquet").select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.length >= 2) // mirrors the query's symmetric length guard
      .groupBy(identity).toSeq
      .map { case (w, v) => w.toVector.map(_.toString) -> v.size.toLong }
    (1 to iters).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, wc) <- seqs; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + wc
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      seqs = seqs.map { case (syms, wc) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            buf += (a + b); i += 2
          } else { buf += syms(i); i += 1 }
        }
        (buf.result(), wc)
      }
      (k.toLong, a, b, a + b, cnt)
    }
  }

  test("t21 equals the textbook sequential BPE trainer") {
    val got = TextAnalytics.bpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    got should have size 6
    got shouldBe bpeReplay(6)
    // merges must actually chain: at least one later merge consumes an
    // earlier merged symbol OR the corpus yields 6 distinct first-chars —
    // either way the 6 pairs are distinct
    got.map(t => (t._2, t._3)).distinct should have size 6
  }

  /** The staged log₂ of an exact integer: bit-length integer part + six
    * fractional bits from six exact squarings (the t20 rule applied to a
    * single integer argument). */
  private def log2q64(x: Long): Long = {
    val ib = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = (x * 1024L) >> ib
    var a = 0L
    (1 to 6).foreach { _ =>
      val m2 = m * m
      if (m2 >= 2097152L) { a = 2 * a + 1; m = m2 / 2048 }
      else { a = 2 * a; m = m2 / 1024 }
    }
    64L * ib + a
  }

  test("t22 equals a from-scratch Kneser-Ney replay; surprisal never negative") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
      .filter(_._2.size >= 2)
    val bf = docs.toSeq.flatMap { case (id, ws) =>
      ws.zip(ws.tail).map(p => (id, p._1, p._2))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cb = bf.toSeq.groupBy { case ((_, w1, w2), _) => (w1, w2) }
      .map { case (k, v) => k -> v.map(_._2).sum }
    val cs = cb.toSeq.groupBy(_._1._1).map { case (w, v) => w -> v.map(_._2).sum }
    val n1r = cb.keys.toSeq.groupBy(_._1).map { case (w, v) => w -> v.size.toLong }
    val n1l = cb.keys.toSeq.groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    val t = cb.size.toLong
    val bits = cb.map { case ((w1, w2), c12) =>
      val num = (4 * c12 - 3) * t + 3 * n1r(w1) * n1l(w2)
      val den = 4 * cs(w1) * t
      (w1, w2) -> (log2q64(den) - log2q64(num))
    }
    bits.values.foreach(_ should be >= 0L)
    val exp = bf.toSeq.groupBy(_._1._1).map { case (id, rows) =>
      val n = rows.map(_._2).sum
      val q = rows.map { case ((_, w1, w2), f) => f * bits((w1, w2)) }.sum
      id -> (n, q, q.toDouble / (64 * n))
    }
    val got = TextAnalytics.knSurprisal(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got shouldBe exp
    // the smoother must discriminate (not all-zero, not all-equal)
    got.values.map(_._3).toSet.size should be > 1
  }
}
