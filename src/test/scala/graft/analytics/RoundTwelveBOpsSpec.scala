package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the round-12 third batch, each pinned against an
  * INDEPENDENT derivation (plain collections, no Spark SQL, no DuckDB):
  *
  * - g3's degree-oriented census must equal a brute-force a<b<c
  *   common-neighbor enumeration over the replayed backbone, and the
  *   clustering coefficient must respect its 0..10⁶ ppm bound.
  * - q59's staged rule metrics must equal a hand-folded basket count
  *   with the exact floor-staging order, and confidence must dominate
  *   support on every emitted rule (co ≤ cnt(a) ⇒ conf ≥ supp).
  */
class RoundTwelveBOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** (order, part) distinct pairs replayed off the raw parquet. */
  private lazy val po: Set[(Long, Long)] = spark.read
    .parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_partkey")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Co-purchase pair counts keyed (pa < pb). */
  private lazy val pairCounts: Map[(Long, Long), Long] =
    po.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).toSeq.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("g3 equals a brute-force common-neighbor census over the backbone") {
    val backbone = pairCounts.toSeq
      .sortBy { case ((pa, pb), w) => (-w, pa, pb) }.take(5000).map(_._1)
    val adj = backbone.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    // brute: for each canonical edge (a<b), close with common neighbors
    // c > b — each triangle counted once at its id-minimal edge
    val tri = backbone.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).count(_ > b).toLong
    }.sum
    val wedges = adj.valuesIterator
      .map(s => s.size.toLong * (s.size - 1) / 2).sum
    val row = GraphOps.triangleCount(spark, sf).collect().head
    row.getLong(0) shouldBe adj.size.toLong
    row.getLong(1) shouldBe backbone.size.toLong
    row.getLong(2) shouldBe wedges
    row.getLong(3) shouldBe tri
    row.getLong(4) shouldBe (if (wedges == 0) 0L else 3 * tri * 1000000L / wedges)
    row.getLong(4) should be <= 1000000L
  }

  test("q59 equals a hand-folded basket fold with the pinned staging order") {
    val nOrders = po.map(_._1).size.toLong
    val itemCnt = po.toSeq.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val expect = pairCounts.toSeq.collect {
      case ((pa, pb), co) if co >= 2 =>
        val conf = co * 1000000L / itemCnt(pa)
        (pa, pb, co, co * 1000000L / nOrders, conf,
          conf * nOrders / itemCnt(pb))
    }.sortBy { case (pa, pb, _, _, _, lift) => (-lift, pa, pb) }.take(20)
    val got = ExtendedQueries.q59AssocRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    got.toSeq shouldBe expect
    // co ≤ cnt(a) by construction ⇒ confidence dominates support
    got.foreach { case (_, _, _, supp, conf, _) => conf should be >= supp }
  }
}
