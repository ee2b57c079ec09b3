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
  * - t26's exposure must equal a replay that groups by the RAW gram
  *   text (no md5) — pinning that the 60-bit fingerprint fold changes
  *   nothing semantically — and dup_ppm must respect its 0..10⁶ bound.
  * - p23's allocation must equal a replayed staged Hamilton + decay
  *   chain, allocations must sum EXACTLY to the demand, and effective
  *   tokens can never exceed the capped allocation.
  * - e20's incremental search must equal a from-scratch ONE-PASS
  *   replay (assign all, search probed cells) — the rebuild-equality
  *   property that makes assign-only appends safe — with provenance
  *   flags exactly at the cutoff.
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

  private lazy val docs: Seq[(Long, String, String)] = spark.read
    .parquet(s"$sf/documents.parquet").select("doc_id", "source", "text")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("t26 equals a raw-gram-text replay; exposure respects its ppm bound") {
    val grams = docs.flatMap { case (id, src, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      if (ws.length < 8) Seq.empty
      else ws.sliding(8).map(g => (id, src, g.mkString(" "))).toSeq
    }
    val gramDocs = grams.groupBy(_._3).map { case (g, xs) =>
      g -> xs.map(_._1).distinct.size
    }
    val expect = grams.groupBy(_._2).map { case (src, xs) =>
      val dup = xs.count(x => gramDocs(x._3) >= 2).toLong
      (src, xs.size.toLong, dup, dup * 1000000L / xs.size)
    }.toSeq.sortBy(_._1)
    val got = TextAnalytics.dupNgramFraction(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe expect
    got.foreach { case (_, _, _, ppm) =>
      ppm should be >= 0L; ppm should be <= 1000000L
    }
  }

  test("p23 equals a replayed staged Hamilton + decay chain; sums are exact") {
    val u = docs.groupBy(_._2).map { case (src, xs) =>
      src -> xs.map(_._3.split(" ", -1).length.toLong).sum
    }
    val b = 2L * u.values.sum
    val tw = u.values.map(x => math.floor(math.sqrt(x.toDouble)).toLong).sum
    val staged = u.map { case (src, us) =>
      val w = math.floor(math.sqrt(us.toDouble)).toLong
      (src, us, (b / tw) * w + ((b % tw) * w) / tw, ((b % tw) * w) % tw)
    }.toSeq
    val extra = b - staged.map(_._3).sum
    val ranked = staged.sortBy { case (src, _, _, rem) => (-rem, src) }
      .zipWithIndex
    val expect = ranked.map { case ((src, us, fl, _), i) =>
      val alloc = fl + (if (i < extra) 1L else 0L)
      val capped = math.min(alloc, 4 * us)
      val f = if (us == 0) 0L else capped / us
      val pr = if (us == 0) 0L else capped % us
      val p2 = 1L << f.toInt
      val eff = (us * (2097152L - 2097152L / p2) + pr * (1048576L / p2)) / 1048576L
      (src, us, alloc, capped, alloc - capped, f, eff,
        if (capped == 0) 0L else eff * 1000000L / capped)
    }.sortBy(_._1)
    val got = PipelineOps.p23RepetitionAlloc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    got.toSeq shouldBe expect
    got.map(_._3).sum shouldBe b // allocations sum EXACTLY to the demand
    got.foreach { case (_, _, _, capped, _, _, eff, _) =>
      eff should be <= capped
    }
  }

  private lazy val emb: Map[Long, Array[Double]] = spark.read
    .parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("e20 equals a one-pass rebuild replay; provenance flags the cutoff") {
    val t = 4L * emb.size / 5L
    val cents = emb.keys.filter(id => id % 31 == 0 && id < math.min(496L, t))
      .toSeq.sorted
    def bestCells(v: Array[Double], n: Int): Seq[Long] =
      cents.map(c => (c, cos(v, emb(c)))).sortBy { case (c, sc) => (-sc, c) }
        .take(n).map(_._1)
    val assigned = emb.map { case (id, v) => id -> bestCells(v, 1).head }
    val expect = emb.keys.filter(_ < 8).toSeq.sorted.flatMap { p =>
      val cells = bestCells(emb(p), 4).toSet
      emb.keys.filter(id => id != p && cells(assigned(id))).toSeq
        .map(id => (id, cos(emb(p), emb(id))))
        .sortBy { case (id, sc) => (-sc, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) =>
          (p, id, i + 1L, if (id >= t) 1L else 0L)
        }
    }
    val got = Similarity.incrementalIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe expect
  }

  test("d14 equals a planted-mirror replay over normalized text") {
    val planted = docs ++ docs.collect {
      case (id, _, text) if id % 3 == 0 => (id + 2000000L, "xmirror", text)
    }
    val sigs = planted.map { case (_, src, text) =>
      (src, text.toLowerCase.replaceAll("\\s+", " "))
    }.distinct
    val n = sigs.groupBy(_._1).map { case (s0, xs) => s0 -> xs.size.toLong }
    val byText = sigs.groupBy(_._2).values.filter(_.size > 1)
    val expect = byText.flatMap { grp =>
      val ss = grp.map(_._1).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.size) yield (ss(i), ss(j))
    }.groupBy(identity).map { case ((a, b), xs) =>
      val shared = xs.size.toLong
      (a, b, n(a), n(b), shared, shared * 1000000L / math.min(n(a), n(b)))
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Dedup.crossSourceDupMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    got.toSeq shouldBe expect
    // in this corpus all cross-source flow goes through the mirror
    got.foreach { case (_, b, _, _, _, ppm) =>
      b shouldBe "xmirror"; ppm should be <= 1000000L
    }
  }

  test("e21 equals plain-Scala intersections of the legs; drift is the gap") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteCosineTopK(spark, sf))
    val full = pairs(Similarity.ivfCosineTopK(spark, sf))
    val frozen = pairs(Similarity.incrementalIvfTopK(spark, sf))
    val got = Similarity.codebookDriftRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (p, fh, zh, drift) =>
      fh shouldBe brute.filter(_._1 == p).count(full)
      zh shouldBe brute.filter(_._1 == p).count(frozen)
      drift shouldBe fh - zh
    }
    got.map(_._1).toSeq shouldBe got.map(_._1).toSeq.sorted
  }

  test("Views name-drop preserves the caller's cache (the r12 eviction fix)") {
    // dropTempView via the public catalog would evict the persisted plan
    // (a view shares its source df's plan); Views must drop the NAME only.
    // Pin the two production victims: their lazy plans must read the
    // cache, not re-derive the corpus-sized subtree per consumer.
    val (q59, baskets) = ExtendedQueries.q59AssocRulesPlan(spark, sf)
    val q59Plan = q59.queryExecution.executedPlan.toString
    baskets.unpersist(false)
    withClue(q59Plan.take(2000)) {
      // both consumers (pair generator, item counts) read the cache
      "InMemoryTableScan".r.findAllIn(q59Plan).length should be >= 2
    }
    // (the second r12 victim, g1, no longer persists through Views: its
    // rank fixpoint moved to a driver loop over the bounded edge list in
    // r14, so q59 remains the production pin for the eviction fix)
  }

  test("q60 equals hand-folded interpolation and the cume_dist disc rule") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val expect = li.groupBy(_._1).map { case (rf, xs) =>
      val q = xs.map(_._2).sorted
      val n = q.length
      def cont(p: Double): Double = {
        val pos = p * (n - 1)
        val lo = q(math.floor(pos).toInt).toDouble
        val hi = q(math.ceil(pos).toInt).toDouble
        lo + (hi - lo) * (pos - math.floor(pos))
      }
      val disc = q(q.indices.find(i => (i + 1).toDouble / n >= 0.9).get)
      (rf, n.toLong, cont(0.25), cont(0.75), disc)
    }.toSeq.sortBy(_._1)
    val got = ExtendedQueries.q60PercentileNative(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    got.toSeq shouldBe expect
  }
}
