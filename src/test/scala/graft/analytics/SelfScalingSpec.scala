package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Bench, SparkEntry, SparkSpec}

/** The quadratic-law knobs (e7 cells, c2 cells, e3 band bits) SELF-SCALE
  * from corpus size when neither an explicit argument nor a session conf
  * pins them (VERDICT r7 item 1: an oracle-pinned constant default was a
  * measured 803 s scale-killer at sf10). These pins gate the resolution
  * order and the self-scaling dispatch — the oracle-gated entries
  * themselves pass explicit args and are covered by CORRECTNESS. */
class SelfScalingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("e7 conf knob still selects the single-level path (SCALE.md back-compat)") {
    try {
      spark.conf.set("spark.graft.knn.cells", "16")
      val viaConf = Similarity.knnGraph(spark, sfDir).collect().toSeq
      val viaArg = Similarity.knnGraph(spark, sfDir, nCells0 = 16).collect().toSeq
      viaConf shouldBe viaArg
    } finally spark.conf.unset("spark.graft.knn.cells")
  }

  test("e7 default (no arg, no conf) dispatches to the two-level codebook at k1 = k2 ≈ n^(1/3)") {
    spark.conf.getOption("spark.graft.knn.cells") shouldBe None
    val n = Tables.embeddings(spark, sfDir).count()
    val side = Similarity.sideFor(n)
    val selfScaled = Similarity.knnGraph(spark, sfDir).collect().toSeq
    val explicit = Similarity.knnGraphTwoLevel(spark, sfDir, k1 = side, k2 = side)
      .collect().toSeq
    selfScaled shouldBe explicit
    selfScaled should not be empty
  }

  test("c2 default derives K = √(2n) and stays a valid dedup verdict") {
    spark.conf.getOption("spark.graft.semdedup.cells") shouldBe None
    val nOrig = Tables.embeddings(spark, sfDir).count()
    val out = Similarity.semanticDedup(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_total"),
        org.apache.spark.sql.functions.sum("n_dropped")).collect()(0)
    // the K-invariance property (SimilarityBandSpec): every ×2 copy drops
    out.getLong(0) shouldBe 2 * nOrig
    out.getLong(1) shouldBe nOrig
  }

  test("e22 resolve order: explicit arg → conf → cellsFor(n); exact at every cell count") {
    // conf knob selects the cell count (rehearsal back-compat)
    val viaConf = try {
      spark.conf.set("spark.graft.range.cells", "16")
      Similarity.rangeSearch(spark, sfDir).collect().toSeq
    } finally spark.conf.unset("spark.graft.range.cells")
    val viaArg = Similarity.rangeSearch(spark, sfDir, nCells0 = 16).collect().toSeq
    viaConf shouldBe viaArg
    // unconfigured default derives K = cellsFor(n) — and because e22 is
    // EXACT by construction (triangle-inequality pruning only ever skips
    // cells that cannot hold a hit), the self-scaled result must equal
    // the pinned-16 gated result row-for-row at ANY cell count
    spark.conf.getOption("spark.graft.range.cells") shouldBe None
    val selfScaled = Similarity.rangeSearch(spark, sfDir).collect().toSeq
    selfScaled shouldBe viaArg
    selfScaled should not be empty
  }

  test("registered surface never shrinks below the floor; every oracle gates a registered query") {
    SparkEntry.queries.size should be >= SparkEntry.expectedQueryCount
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }

  test("bench heap preflight warns when heap is undersized for the data scale") {
    Bench.heapWarning(dataBytes = 1L << 30, maxHeapBytes = 4L << 30) shouldBe defined
    Bench.heapWarning(dataBytes = 1L << 30, maxHeapBytes = 16L << 30) shouldBe empty
    // floor: tiny data still wants 4 g
    Bench.heapWarning(dataBytes = 1L << 20, maxHeapBytes = 1L << 30) shouldBe defined
  }
}
