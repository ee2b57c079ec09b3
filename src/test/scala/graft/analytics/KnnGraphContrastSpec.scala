package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The correctness gate for the DEMOTED e7 single-level mutual-kNN graph
  * (VERDICT r9 #3a): e7 left the registered bench/oracle surface in r10 —
  * e9's two-level path is the production shape — but remains the measured
  * single-level algorithmic contrast, so its semantics stay pinned here
  * against a from-scratch, non-Spark re-derivation: plain Scala loops over
  * the collected sf0.001 corpus, replaying the every-31st-vector centroid
  * rule, the (cscore desc, cell_id asc) assignment argmax, the in-cell
  * (cos desc, dst asc) top-k, and the reciprocal filter. Cosines use the
  * identical left-to-right double accumulation as `graft_cosine`, so the
  * comparison is exact, not tolerance-based. */
class KnnGraphContrastSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // same loop shape and accumulation order as CosineSimilarity.nullSafeEval
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("e7 self-scaled mutual kNN graph matches an in-JVM brute-force re-derivation") {
    val k = 3
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("cast(vec_id as bigint) as vec_id",
        "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val kCells = Similarity.cellsFor(rows.length.toLong)
    // at tiny SFs 31·K can exceed the max vec_id, so the every-31st-vector
    // codebook may hold fewer than kCells centroids — same as production
    val centroids = rows.filter { case (id, _) => id % 31 == 0 && id < 31L * kCells }
    centroids should not be empty

    // assignment argmax: max of (cscore, -cell_id) — the struct-max tie rule
    val cellOf: Map[Long, Long] = rows.map { case (id, v) =>
      id -> centroids.map { case (cid, cv) => (cos(v, cv), -cid, cid) }
        .maxBy { case (s, nid, _) => (s, nid) }._3
    }.toMap
    // directed in-cell top-k by (cos desc, dst asc)
    val topk: Map[Long, Set[Long]] =
      rows.groupBy(r => cellOf(r._1)).values.flatMap { members =>
        members.map { case (src, v) =>
          src -> members.iterator.filter(_._1 != src)
            .map { case (dst, dv) => (dst, cos(v, dv)) }
            .toSeq.sortBy { case (dst, c) => (-c, dst) }
            .take(k).map(_._1).toSet
        }
      }.toMap
    val expected = (for {
      (a, nbrs) <- topk.toSeq
      b <- nbrs
      if a < b && topk(b).contains(a)
    } yield (a, b)).sorted

    val got = Similarity.knnGraphSelfScaled(spark, sfDir)
      .selectExpr("cast(vec_a as bigint)", "cast(vec_b as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    got shouldBe expected
    expected should not be empty // the gate must not pass vacuously
  }
}
