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

  test("invalid band width is rejected at construction") {
    try {
      spark.conf.set("spark.graft.ann.neardupBandBits", "12")
      an[IllegalArgumentException] should be thrownBy
        Similarity.embeddingNearDup(spark, sfDir)
    } finally spark.conf.unset("spark.graft.ann.neardupBandBits")
  }
}
