package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Corpus-shape FUZZ for the dispatching operators (VERDICT r9 #8): d7's
  * round-9 lesson was that both performance AND strategy choice depend on
  * the corpus's df profile, and its two paths were pinned to agree on only
  * two hand-built corpora. This spec generates ≥20 seeded random corpus
  * shapes — vocabulary size, stopword (df) skew, doc-length distribution,
  * duplication rate — and asserts the direct incidence-count path and the
  * PPJoin prefix path produce IDENTICAL verified pair sets on every one,
  * pair for pair, regardless of which side of the Σdf² ≤ 64·Σdf dispatch
  * boundary the shape lands on. The e7/e9 self-scaling integer rules get
  * the same treatment over random corpus sizes: the exact-arithmetic
  * definitions the DuckDB oracles replay must hold at every n. */
class DispatchFuzzSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Deterministic corpus from a seed: returns (docs, shapeDescription). */
  private def corpus(seed: Int): (Seq[(Long, String)], String) = {
    val rnd = new scala.util.Random(seed)
    val vocab = 5 + rnd.nextInt(196)          // 5..200 distinct words
    val nDocs = 20 + rnd.nextInt(61)          // 20..80 docs
    val stopSkew = rnd.nextDouble() * 0.9     // P(word is a top-5 stopword)
    val maxLen = 4 + rnd.nextInt(37)          // 4..40 words
    val dupRate = rnd.nextDouble() * 0.4      // P(doc copies an earlier doc)
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (0 until nDocs).foreach { i =>
      val text =
        if (dupRate > 0 && i > 0 && rnd.nextDouble() < dupRate)
          docs(rnd.nextInt(i))._2 // exact or near-duplicate source
        else {
          val len = 3 + rnd.nextInt(maxLen - 2)
          (0 until len).map { _ =>
            if (rnd.nextDouble() < stopSkew) s"w${rnd.nextInt(5)}"
            else s"w${rnd.nextInt(vocab)}"
          }.mkString(" ")
        }
      docs += ((i.toLong, text))
    }
    (docs.toSeq,
      s"seed=$seed vocab=$vocab docs=$nDocs skew=${(stopSkew * 100).round}% maxLen=$maxLen")
  }

  test("d7: direct and prefix containment strategies agree pair-for-pair on 20 seeded corpus shapes") {
    val s = spark
    import s.implicits._
    (1 to 20).foreach { seed =>
      val (docs, shape) = corpus(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"fuzz-$seed").toString
      docs.toDF("doc_id", "text").coalesce(2)
        .write.parquet(s"$dir/documents.parquet")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      withClue(s"$shape:\n") {
        val direct = rows(Dedup.containmentDedupDirect(spark, dir))
        val prefix = rows(Dedup.containmentDedupPrefix(spark, dir))
        direct shouldBe prefix
        // and the dispatcher's choice equals both (it IS one of them)
        rows(Dedup.containmentDedup(spark, dir)) shouldBe direct
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("e7/e9 self-scaling K rules hold at fuzzed corpus sizes (the exact-arithmetic oracle contract)") {
    val rnd = new scala.util.Random(42)
    val ns = Seq(1L, 2L, 15L, 16L, 17L, 255L, 256L, 257L, 65535L, 65536L) ++
      (1 to 200).map(_ => 1L + (rnd.nextLong() & 0xFFFFFFFFFL)) // up to ~6.9e10
    ns.foreach { n =>
      val k = Similarity.cellsFor(n)
      withClue(s"cellsFor($n)=$k:") {
        k should be >= 4
        k should be <= 4096
        if (k < 4096) (k.toLong * k) should be >= n // smallest s with s² ≥ n
        if (k > 4) ((k - 1).toLong * (k - 1)) should be < n
      }
      val side = Similarity.sideFor(n)
      withClue(s"sideFor($n)=$side:") {
        side should be >= 4
        side should be <= 512
        if (side < 512) (side.toLong * side * side) should be >= n
        if (side > 4) {
          val p = (side - 1).toLong
          (p * p * p) should be < n
        }
      }
    }
  }

  // ---- round-10 operator widening (VERDICT r10 #8) ----

  private def h15(sIn: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sIn.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Pathological corpora for d12: repeat structure is exactly what
    * content-defined chunking exists to exploit, so fuzz it directly. */
  private def repeatCorpus(seed: Int): (Seq[(Long, String)], Int, String) = {
    val rnd = new scala.util.Random(1000 + seed)
    val mask = Seq(1, 2, 4, 16, 64, 1024)(rnd.nextInt(6))
    val structure = seed % 5
    val nDocs = 15 + rnd.nextInt(30)
    val vocab = 3 + rnd.nextInt(60)
    def word() = s"w${rnd.nextInt(vocab)}"
    val phrases = (0 until 6).map(_ =>
      (0 until (2 + rnd.nextInt(8))).map(_ => word()).mkString(" "))
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (0 until nDocs).foreach { i =>
      val text = structure match {
        case 0 => // random tokens
          (0 until (3 + rnd.nextInt(30))).map(_ => word()).mkString(" ")
        case 1 => // shared-phrase mosaics: cross-doc chunk hits
          (0 until (1 + rnd.nextInt(5)))
            .map(_ => phrases(rnd.nextInt(phrases.length))).mkString(" ")
        case 2 => // self-repetition: one token run (intra-doc dup chunks)
          Seq.fill(2 + rnd.nextInt(40))(s"w${i % 3}").mkString(" ")
        case 3 => // whole-doc duplicates of doc 0
          if (i == 0) (0 until 20).map(_ => word()).mkString(" ")
          else docs(0)._2
        case _ => // single-token docs (chunk == doc == token)
          word()
      }
      docs += ((i.toLong, text))
    }
    (docs.toSeq, mask, s"seed=$seed structure=$structure mask=$mask docs=$nDocs")
  }

  /** d12's semantics, from scratch, parameterized by mask (the
    * RoundTenOpsSpec replay generalized). */
  private def cdcReplay(docs: Seq[(Long, String)], mask: Int): Set[(Long, Long, Long, Long, Long)] = {
    val occ = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      val cuts = ws.indices.filter(i => h15(ws(i)) % mask == 0).map(_ + 1)
      val starts = 0 +: cuts
      val ends = cuts :+ ws.length
      starts.zip(ends).filter { case (st, en) => en > st }.map { case (st, en) =>
        (id, h15(ws.slice(st, en).mkString(" ")), (en - st).toLong)
      }
    }
    val oc = occ.groupBy(x => (x._1, x._2)).map { case ((id, sig), xs) =>
      (id, sig, xs.head._3, xs.size.toLong)
    }
    val firstDoc = oc.groupBy(_._2).map { case (sig, xs) => sig -> xs.map(_._1).min }
    oc.groupBy(_._1).map { case (id, xs) =>
      val first = (sig: Long) => if (firstDoc(sig) == id) 1L else 0L
      (id, xs.map(_._4).sum,
        xs.map { case (_, sig, _, o) => o - first(sig) }.sum,
        xs.map(x => x._4 * x._3).sum,
        xs.map { case (_, sig, ntok, o) => (o - first(sig)) * ntok }.sum)
    }.toSet
  }

  test("d12: 20 seeded repeat structures x chunk-mask regimes equal the from-scratch replay") {
    val s = spark
    import s.implicits._
    (1 to 20).foreach { seed =>
      val (docs, mask, shape) = repeatCorpus(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"d12fuzz-$seed").toString
      docs.toDF("doc_id", "text").coalesce(2)
        .write.parquet(s"$dir/documents.parquet")
      withClue(s"$shape:\n") {
        val actual = Dedup.cdcChunkDedup(spark, dir, mask)
          .select("doc_id", "n_chunks", "n_dup_chunks", "n_tokens", "dup_tokens")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
        actual shouldBe cdcReplay(docs, mask)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  /** t17's semantics from scratch, parameterized by bucket count. */
  private def dsirReplay(docs: Seq[(Long, String, String)], nBuckets: Int)
      : (Set[(Long, Long, Long)], Map[Long, Long]) = {
    val perDoc = docs.map { case (id, text, lang) =>
      val ws = text.toLowerCase.split(" ", -1)
      val bs = ws.indices.dropRight(1)
        .map(i => h15(s"${ws(i)} ${ws(i + 1)}") % nBuckets)
      (id, lang == "en", bs)
    }.filter(_._3.nonEmpty)
    val raw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val tgt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    perDoc.foreach { case (_, isEn, bs) =>
      bs.foreach { b => raw(b) += 1; if (isEn) tgt(b) += 1 }
    }
    def bits(x: Long): Long =
      if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)
    val lam = raw.keys.map { b =>
      b -> (bits(((tgt(b) + 1) * 1048576L) / (raw(b) + 1)) - 20L)
    }.toMap
    (perDoc.map { case (id, _, bs) => (id, bs.size.toLong, bs.map(lam).sum) }.toSet,
      lam)
  }

  private def langCorpus(seed: Int, enProb: Double): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(2000 + seed)
    val vocab = 4 + rnd.nextInt(40)
    (0 until (15 + rnd.nextInt(25))).map { i =>
      val len = 2 + rnd.nextInt(25)
      val text = (0 until len).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" ")
      val lang = if (rnd.nextDouble() < enProb) "en" else "de"
      (i.toLong, text, lang)
    }
  }

  test("t17: lambda-saturation (all-target / zero-target) and 10 mixed shapes equal the replay") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq((1, 1.0, 8), (2, 0.0, 64), (3, 1.0, 1024), (4, 0.0, 1024)) ++
      (5 to 14).map(i => (i, 0.1 + (i % 9) * 0.1, Seq(8, 64, 1024)(i % 3)))
    cases.foreach { case (seed, enProb, nBuckets) =>
      val docs = langCorpus(seed, enProb)
      val dir = java.nio.file.Files.createTempDirectory(s"t17fuzz-$seed").toString
      docs.toDF("doc_id", "text", "lang").coalesce(2)
        .write.parquet(s"$dir/documents.parquet")
      val (expected, lam) = dsirReplay(docs, nBuckets)
      withClue(s"seed=$seed enProb=$enProb buckets=$nBuckets:\n") {
        val actual = TextAnalytics.dsirImportance(spark, dir, nBuckets)
          .select("doc_id", "n_feats", "importance")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        actual shouldBe expected
        // saturation laws: target == raw → λ = 0 everywhere (importance
        // 0); empty target → λ strictly ≤ 0; mixed → λ ≤ 0 (subcorpus)
        if (enProb == 1.0) all(lam.values) shouldBe 0L
        all(lam.values) should be <= 0L
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("s18 equals t17 verbatim at both lambda-saturation extremes") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((21, 1.0), (22, 0.0)).foreach { case (seed, enProb) =>
      val docs = langCorpus(seed, enProb)
      val dir = java.nio.file.Files.createTempDirectory(s"s18fuzz-$seed").toString
      docs.toDF("doc_id", "text", "lang").coalesce(2)
        .write.parquet(s"$dir/documents.parquet")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "n_feats", "importance", "mean_lambda")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      withClue(s"seed=$seed enProb=$enProb:\n") {
        rows(StreamingQueries.streamDsirScore(spark, dir)) shouldBe
          rows(TextAnalytics.dsirImportance(spark, dir))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("e11: recall against brute truth never degrades as coarseK grows") {
    val sf = "/root/testdata/sf0.001"
    val truth = Similarity.bruteCosineTopK(spark, sf, k = 5)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(5, 8, 16, 32, 64).map { coarseK =>
      val got = Similarity.twoStageRerank(spark, sf, k = 5, coarseK = coarseK)
        .select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      coarseK -> (got intersect truth).size.toDouble / truth.size
    }
    withClue(s"recall curve: $recalls\n") {
      recalls.sliding(2).foreach {
        case Seq((_, a), (_, b)) => b should be >= a
        case _ => ()
      }
      // and the refine tier must be doing real work by the top end
      recalls.last._2 should be >= 0.9
    }
  }
}
