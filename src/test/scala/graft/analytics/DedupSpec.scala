package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** d5 paragraph dedup: semantics pinned against an in-Scala first-occurrence
  * sweep at sf0.001, plus the plan shape that must survive 100 TB (content-
  * hash window partitioning — unbounded parallelism — and exactly the two
  * unavoidable exchanges for a document-reconstruction operator). */
class DedupSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("d5 matches the sequential first-occurrence sweep (corpus order, 10-word segments)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val expected = docs.flatMap { case (id, text) =>
      val kept = text.split(" ", -1).grouped(10).map(_.mkString(" "))
        .filter(seen.add).toSeq
      if (kept.isEmpty) None
      else Some((id, kept.size.toLong, kept.mkString(" ")))
    }.toSeq

    val got = Dedup.paragraphDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected)
    // the operator must actually remove something at this SF, and some doc
    // must survive only partially (otherwise the test proves nothing)
    val keptSegs = got.map(_._2).sum
    val totalSegs = docs.map { case (_, t) => (t.split(" ", -1).length + 9) / 10 }.sum
    assert(keptSegs < totalSegs)
  }

  test("d5 invariants on random corpora: global uniqueness, order, conservation") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d") // tiny vocab → many segment collisions
    for (trial <- 0 until 3) {
      val segWords = Seq(2, 3, 10)(trial)
      val docs = (0 until 30).map { id =>
        val n = rng.nextInt(25) + 1
        (id.toLong, Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" "))
      }
      val out = Dedup.paragraphDedupDf(docs.toDF("doc_id", "text"), segWords)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

      // 1. no segment string survives twice anywhere in the cleaned corpus
      val allSegs = out.flatMap { case (_, _, t) =>
        t.split(" ", -1).grouped(segWords).map(_.mkString(" "))
      }
      allSegs.distinct.length shouldBe allSegs.length
      // 2. each cleaned doc is a subsequence of its original's segments,
      //    in order, and n_kept counts them
      val orig = docs.toMap
      out.foreach { case (id, nKept, t) =>
        val mine = t.split(" ", -1).grouped(segWords).map(_.mkString(" ")).toSeq
        mine.size.toLong shouldBe nKept
        val origSegs = orig(id).split(" ", -1).grouped(segWords).map(_.mkString(" ")).toSeq
        // subsequence check
        var i = 0
        mine.foreach { m =>
          val j = origSegs.indexOf(m, i); j should be >= 0; i = j + 1
        }
      }
      // 3. conservation: the set of distinct segment strings is preserved
      val origDistinct = docs.flatMap { case (_, t) =>
        t.split(" ", -1).grouped(segWords).map(_.mkString(" "))
      }.distinct.sorted
      allSegs.sorted.toSeq shouldBe origDistinct.toSeq
    }
  }

  test("d5 plan: content-hash window + doc regroup, no joins, no cartesian") {
    val plan = Dedup.paragraphDedup(spark, sfDir).queryExecution.executedPlan.toString
    withClue(s"d5 plan:\n$plan\n") {
      plan should include("Window")
      // keep decision partitions by the 64-bit content hash, never the
      // segment string (the window key is the projected xxhash64 column)
      plan should include("xxhash64(seg")
      plan should not include "Join"
      // two hash exchanges total: the window's content-hash partitioning
      // and the per-doc reassembly aggregation (orderBy adds only a range
      // exchange)
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 2
    }
  }
}
