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
}
