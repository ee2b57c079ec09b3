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
        side should be <= 256
        if (side < 256) (side.toLong * side * side * side) should be >= n
        if (side > 4) {
          val p = (side - 1).toLong
          (p * p * p * p) should be < n
        }
      }
    }
  }
}
