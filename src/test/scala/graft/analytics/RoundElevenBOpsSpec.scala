package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the round-11 continuation operators, each pinned
  * against an INDEPENDENT derivation (the RoundTen/ElevenOpsSpec
  * discipline — plain collections, no Spark, no SQL):
  *
  * - e15's IVF-PQ must equal a from-scratch in-memory replay of the whole
  *   index: coarse assignment, residuals, residual sub-codebooks, encode
  *   argmin, per-(probe, cell) LUT, fixed-order ADC, top-k — and every
  *   returned neighbor must live in one of its probe's probed cells (the
  *   IVF pruning actually pruned).
  * - t23's fertility audit must equal encoding with the textbook
  *   sequential BPE trainer and folding per source by hand.
  * - s21's streamed drift must equal an in-memory md5-bucketed KL replay
  *   of the identical exact-BIGINT staging.
  */
class RoundElevenBOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  test("e15 equals a from-scratch in-memory IVF-PQ replay; IVF pruning holds") {
    val emb: Map[Long, Array[Double]] = spark.read
      .parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cents: Seq[(Long, Array[Double])] =
      emb.keys.filter(id => id % 31 == 0 && id < 496).toSeq.sorted
        .map(id => id -> emb(id))
    def nearestCells(v: Array[Double], n: Int): Seq[Long] =
      cents.map { case (c, cv) => (cos(v, cv), c) }
        .sortBy { case (s, c) => (-s, c) }.take(n).map(_._2)
    val assign: Map[Long, Long] =
      emb.map { case (id, v) => id -> nearestCells(v, 1).head }
    val centMap = cents.toMap
    val resid: Map[Long, Array[Double]] = emb.map { case (id, v) =>
      id -> v.zip(centMap(assign(id))).map { case (x, y) => x - y }
    }
    def sub(r: Array[Double], m: Int): Array[Double] = r.slice(m * 16, m * 16 + 16)
    val cb: Map[(Int, Int), Array[Double]] = (for {
      id <- emb.keys.toSeq if id % 29 == 0 && id < 232
      m <- 0 until 4
    } yield ((id / 29).toInt, m) -> sub(resid(id), m)).toMap
    def encode(r: Array[Double], m: Int): Int =
      (0 until 8).map(c => (l2sq(sub(r, m), cb((c, m))), c)).minBy(identity)._2
    val codes: Map[Long, Seq[Int]] =
      resid.map { case (id, r) => id -> (0 until 4).map(m => encode(r, m)) }
    val exp = (0L until 8L).flatMap { p =>
      val pv = emb(p)
      val probed = nearestCells(pv, 4)
      val pres: Map[Long, Array[Double]] = probed.map { c =>
        c -> pv.zip(centMap(c)).map { case (x, y) => x - y }
      }.toMap
      val cand = emb.keys.filter(id => id != p && probed.contains(assign(id)))
      val scored = cand.map { id =>
        val cell = assign(id)
        val ds = (0 until 4).map(m => l2sq(sub(pres(cell), m), cb((codes(id)(m), m))))
        id -> (((ds(0) + ds(1)) + ds(2)) + ds(3))
      }.toSeq
      scored.sortBy { case (id, a) => (a, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (p, id, i + 1L) }
    }
    val got = Similarity.ivfPqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe exp
    // pruning is real: every neighbor sits in a probed cell of its probe
    got.foreach { case (p, n, _) =>
      nearestCells(emb(p), 4) should contain(assign(n))
    }
    got should have size 40
  }

  /** Sequential textbook BPE: train 6 merges, return each word's final
    * symbol count (the encoder the positional chain must agree with). */
  private def bpeEncodeReplay(iters: Int): Map[String, Long] = {
    var seqs: Map[String, Vector[String]] = spark.read
      .parquet(s"$sf/documents.parquet").select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.length >= 2).distinct
      .map(w => w -> w.toVector.map(_.toString)).toMap
    val wc: Map[String, Long] = spark.read
      .parquet(s"$sf/documents.parquet").select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    (1 to iters).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- seqs; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + wc(w)
      }
      val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      seqs = seqs.map { case (w, syms) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            buf += (a + b); i += 2
          } else { buf += syms(i); i += 1 }
        }
        w -> buf.result()
      }
    }
    seqs.map { case (w, syms) => w -> syms.length.toLong }
  }

  test("t23 equals sequential-BPE encoding folded per source by hand") {
    val ntoks = bpeEncodeReplay(6)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val exp = rows.groupBy(_._1).map { case (src, ws) =>
      val nWords = ws.length.toLong
      val nTokens = ws.map { case (_, w) =>
        if (w.length >= 2) ntoks(w) else w.length.toLong
      }.sum
      val nChars = ws.map(_._2.length.toLong).sum
      src -> (nWords, nTokens, nChars,
        nTokens.toDouble / nWords, nChars.toDouble / nTokens)
    }
    val got = TextAnalytics.bpeFertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    got shouldBe exp
    // merges must actually compress: fertility strictly below chars/word
    got.foreach { case (_, (nw, _, nc, fert, _)) =>
      fert should be < (nc.toDouble / nw)
    }
  }

  test("e16 equals intersecting the three legs' own registered outputs") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteCosineTopK(spark, sf)
      .select("probe_id", "neighbor_id"))
    val pq = pairs(Similarity.pqAdcTopK(spark, sf)
      .select("probe_id", "neighbor_id"))
    val ivfpq = pairs(Similarity.ivfPqTopK(spark, sf)
      .select("probe_id", "neighbor_id"))
    val exp = brute.groupBy(_._1).map { case (p, ks) =>
      p -> (ks.count(pq.contains).toLong, ks.count(ivfpq.contains).toLong)
    }
    val got = Similarity.ivfPqRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got shouldBe exp
    // the audit must measure something: at least one probe recalls a true
    // neighbor through the compressed index
    got.values.map(_._2).max should be > 0L
  }

  test("d13 equals reweighting n4's own registered clustering in plain Scala") {
    val clusters = NearDup.minhashClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc_id -> cluster_id
    val sizes = clusters.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val exp = docs.map { id =>
      val (c, n) = clusters.get(id).fold((-1L, 1L))(c => (c, sizes(c)))
      id -> (c, n, 1048576L / n, (1048576L / n).toDouble / 1048576.0)
    }.toMap
    val got = NearDup.softDedupWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    got shouldBe exp
    // weights must reconcile: every cluster's members sum to ~1 doc of
    // mass (within div truncation) and some cluster actually has n > 1
    got.values.map(_._2).max should be > 1L
    got.values.filter(_._1 >= 0).groupBy(_._1).foreach { case (_, vs) =>
      val n = vs.head._2
      vs.map(_._3).sum shouldBe (1048576L / n) * n
    }
  }

  test("m9 equals an in-memory frame-fingerprint replay; every video pairs with its copy") {
    val vids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .filter(_.getLong(0) % 3 == 2)
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8"),
        r.getLong(2) * 40L))
    def print0(payload: Array[Byte], durMs: Long): (Long, String) = {
      val nf = math.min(8L, math.max(1L, durMs / 1000L)).toInt
      val fb = payload.length / nf
      val fps = (0 until nf).map { f =>
        val fsum = (f * fb until (f + 1) * fb).map(i => (payload(i) & 0xFF).toLong).sum
        (0 until math.min(62, fb)).foldLeft(0L) { (sig, b) =>
          if (fb.toLong * (payload(f * fb + b) & 0xFF) > fsum) sig | (1L << b) else sig
        }
      }
      (nf.toLong, fps.mkString("_"))
    }
    val prints = vids.flatMap { case (id, p, dur) =>
      val (nf, fp) = print0(p, dur)
      Seq((id, nf, fp), (id + 1000000L, nf, fp))
    }
    val exp = prints.groupBy(t => (t._2, t._3)).map { case ((nf, fp), vs) =>
      (vs.map(_._1).min, vs.size.toLong, nf, fp)
    }.toSet
    val got = Multimodal.videoDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    got shouldBe exp
    // the doubled corpus means every group has an even copy count, and at
    // least one fingerprint actually discriminates (not all videos equal)
    got.foreach { case (_, n, _, _) => n % 2 shouldBe 0L }
    got.size should be > 1
  }

  test("s21 equals an in-memory md5-bucketed KL replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): Long = {
      val h = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(h, 16) % 1024
    }
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .map(t => (r.getString(0), bucket(t))))
    val sb = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c = sb.groupBy(_._1._2).map { case (b, v) => b -> v.values.sum }
    val tTotal = sb.values.sum
    val ts = sb.groupBy(_._1._1).map { case (s, v) => s -> v.values.sum }
    val exp = sb.groupBy(_._1._1).map { case (src, rows) =>
      val klSum = rows.map { case ((_, b), cs) =>
        // exact BigInt replay of the ExactMath.mulDiv staging (identical
        // value — the limb split is an identity, only overflow behavior
        // differs); lam via bin()-length semantics, where bin(0) = "0"
        // has length 1 so staged == 0 maps to -20, not -21 (ADVICE r11)
        val staged = ((BigInt(cs) * 1048576 / c(b)) * tTotal / ts(src)).toLong
        val lam = (if (staged == 0L) 0L
                   else 63L - java.lang.Long.numberOfLeadingZeros(staged)) - 20L
        cs * lam
      }.sum
      src -> (ts(src), klSum, klSum.toDouble / ts(src))
    }
    val got = StreamingQueries.streamDriftAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got shouldBe exp
    // the monitor must discriminate between sources
    got.values.map(_._3).toSet.size should be > 1
  }
}
