package graft.analytics

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the round-10 operators, each pinned against an
  * INDEPENDENT derivation (not the query's own plan):
  *
  * - e11 must DEGENERATE to e1's brute force when the coarse cut covers
  *   the whole corpus — the refine stage cannot reorder, only cut.
  * - s17's per-row struct-argmax cell assignment must equal e4's
  *   window-rank argmax (same score, same tie-break) after the drain.
  * - m7's decoder-side frame sums and cut rule must equal a from-scratch
  *   in-memory replay of the byte-slice model.
  * - t17's weights obey the DSIR contract (λ ≤ 0 everywhere since the
  *   target is a subcorpus; feature counts conserve bigram counts) and
  *   the full importance column equals a from-scratch MD5-bucket replay.
  */
class RoundTenOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("e11 with a corpus-covering coarse cut degenerates to e1 brute force") {
    val brute = Similarity.bruteCosineTopK(spark, sf, k = 5)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val refined = Similarity.twoStageRerank(spark, sf, k = 5, coarseK = 100000)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    refined shouldBe brute
  }

  test("s17 drained occupancy equals e4's window-rank argmax occupancy") {
    val streamed = StreamingQueries.queries("s17_stream_ann_ingest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent batch derivation: e4's assignment rule via window rank
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = emb.filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * 16)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(expr("graft_cosine(v, cv)").desc, col("cell_id"))
    val batch = emb.join(broadcast(cents))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") === 1)
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("vec_id")).as("id_checksum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    streamed shouldBe batch
  }

  test("m7 equals a from-scratch replay of the frame/cut model") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.filter(_._1 % 3 == 2).map { case (id, text, nChars) =>
      val bytes = text.getBytes("UTF-8")
      val nf = math.min(8L, math.max(1L, nChars * 40L / 1000L)).toInt
      val fb = bytes.length / nf
      val sums = (0 until nf).map { f =>
        bytes.slice(f * fb, (f + 1) * fb).map(b => (b & 0xFF).toLong).sum
      }
      val cuts = sums.indices.drop(1).filter { i =>
        math.abs(sums(i) - sums(i - 1)) * 4 > sums(i) + sums(i - 1)
      }
      (id, nf.toLong, cuts.size.toLong,
        cuts.headOption.map(_.toLong).getOrElse(-1L))
    }.toSet
    val actual = Multimodal.sceneChange(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    actual shouldBe expected
  }

  test("d12 equals a from-scratch CDC chunking + first-occurrence replay") {
    val md = MessageDigest.getInstance("MD5")
    def h15(sIn: String): Long = {
      val hex = md.digest(sIn.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // chunk table: (doc_id, sig, ntok) occurrences
    val occ = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      val cuts = ws.indices.filter(i => h15(ws(i)) % 16 == 0).map(_ + 1)
      val starts = 0 +: cuts
      val ends = cuts :+ ws.length
      starts.zip(ends).filter { case (st, en) => en > st }.map { case (st, en) =>
        val chunk = ws.slice(st, en).mkString(" ")
        (id, h15(chunk), (en - st).toLong)
      }
    }
    val oc = occ.groupBy(x => (x._1, x._2)).map { case ((id, sig), xs) =>
      (id, sig, xs.head._3, xs.size.toLong)
    }
    val firstDoc = oc.groupBy(_._2).map { case (sig, xs) => sig -> xs.map(_._1).min }
    val expected = oc.groupBy(_._1).map { case (id, xs) =>
      val nChunks = xs.map(_._4).sum
      val dupO = xs.map { case (_, sig, _, o) =>
        o - (if (firstDoc(sig) == id) 1L else 0L)
      }.sum
      val nTok = xs.map(x => x._4 * x._3).sum
      val dupTok = xs.map { case (_, sig, ntok, o) =>
        (o - (if (firstDoc(sig) == id) 1L else 0L)) * ntok
      }.sum
      (id, nChunks, dupO, nTok, dupTok)
    }.toSet
    val actual = Dedup.cdcChunkDedup(spark, sf)
      .select("doc_id", "n_chunks", "n_dup_chunks", "n_tokens", "dup_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    actual shouldBe expected
  }

  test("p21 allocations sum EXACTLY to the budget and respect proportionality") {
    val rows = PipelineOps.p21TokenBudgetAlloc(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.map(_._3).sum shouldBe 10000L // the apportionment invariant
    val totalMass = rows.map(_._2).sum
    rows.foreach { case (src, mass, alloc) =>
      // Hamilton rounding never strays more than 1 from the exact quota
      val exactFloor = 10000L * mass / totalMass
      withClue(s"$src: mass=$mass alloc=$alloc floor=$exactFloor") {
        alloc should (be(exactFloor) or be(exactFloor + 1))
      }
    }
  }

  test("e13 neighbors all share their probe's label and equal per-label brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val byId = emb.map(e => e._1 -> e).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = emb.filter(_._1 < 8).flatMap { case (pid, plabel, pv) =>
      emb.filter(e => e._1 != pid && e._2 == plabel)
        .map(e => (e._1, cos(pv, e._3)))
        .sortBy { case (id, c) => (-c, id) }
        .take(5).zipWithIndex
        .map { case ((nid, _), i) => (pid, nid, plabel.toLong, (i + 1).toLong) }
    }.toSet
    val actual = Similarity.filteredAnn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    actual.foreach { case (pid, nid, lbl, _) =>
      byId(nid)._2.toLong shouldBe lbl
      byId(pid)._2.toLong shouldBe lbl
    }
    actual shouldBe expected
  }

  test("t17 equals a from-scratch MD5-bucket replay and obeys the DSIR contract") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md = MessageDigest.getInstance("MD5")
    def bucket(bigram: String): Long = {
      val hex = md.digest(bigram.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    val perDoc = docs.map { case (id, text, lang) =>
      val ws = text.toLowerCase.split(" ", -1)
      val buckets = ws.indices.dropRight(1).map(i => bucket(s"${ws(i)} ${ws(i + 1)}"))
      (id, lang == "en", buckets)
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
    val expected = perDoc.map { case (id, _, bs) =>
      (id, bs.size.toLong, bs.map(lam).sum)
    }.toSet
    val actual = TextAnalytics.dsirImportance(spark, sf)
      .select("doc_id", "n_feats", "importance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    actual shouldBe expected
    // the target is a subcorpus of the raw distribution → λ ≤ 0 everywhere
    all(lam.values) should be <= 0L
  }
}
