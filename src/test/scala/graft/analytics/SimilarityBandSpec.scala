package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The e3 band-width knob (`spark.graft.ann.neardupBandBits`): candidate
  * volume grows as bands · n² / 2^bits, so past ~10⁶ vectors a deployment
  * widens the bands. The verified OUTPUT must not depend on the knob for
  * pairs the banding still recalls — and cos≈1 duplicate pairs collide at
  * ANY width (identical signatures), which is exactly the near-dup tier.
  */
class SimilarityBandSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("e3 output is identical at 16-bit (default) and 32-bit bands on this corpus") {
    def pairs() = Similarity.embeddingNearDup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val default = pairs()
    default should not be empty
    // every original must pair with its scaled copy (cosine exactly 1)
    default.foreach { case (a, b) => b shouldBe a + 1000000L }
    try {
      spark.conf.set("spark.graft.ann.neardupBandBits", "32")
      pairs() shouldBe default
    } finally spark.conf.unset("spark.graft.ann.neardupBandBits")
  }

  test("c2 dedup verdict is K-invariant: every copy is dropped at any cell count") {
    // The K knob (spark.graft.semdedup.cells) trades per-cell quadratic
    // cost against recall of CROSS-cell near-dups. Exact duplicates can
    // never split cells (a ×2-scaled copy has identical cosines to every
    // centroid, so identical argmax), so the dropped total must equal the
    // original corpus size at EVERY K — the invariant that makes the knob
    // safe to raise with corpus growth.
    val nOrig = Tables.embeddings(spark, sfDir).count()
    Seq(2, 8, 32).foreach { k =>
      val out = Similarity.semanticDedup(spark, sfDir, nCells0 = k)
        .agg(org.apache.spark.sql.functions.sum("n_total"),
          org.apache.spark.sql.functions.sum("n_dropped"))
        .collect()(0)
      withClue(s"K=$k:") {
        out.getLong(0) shouldBe 2 * nOrig
        out.getLong(1) shouldBe nOrig
      }
    }
  }

  test("invalid band width is rejected at construction") {
    try {
      spark.conf.set("spark.graft.ann.neardupBandBits", "12")
      an[IllegalArgumentException] should be thrownBy
        Similarity.embeddingNearDup(spark, sfDir)
    } finally spark.conf.unset("spark.graft.ann.neardupBandBits")
  }
}
