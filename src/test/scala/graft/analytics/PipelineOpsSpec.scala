package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pipeline-composition operators (PipelineOps): semantics pinned against
  * in-Scala brute force at sf0.001, plus the plan shapes that must survive
  * a 100 TB scale-up (as-of = one union+window pass, not a range join;
  * sampling/chunking/redaction = narrow, no hash shuffle). */
class PipelineOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("p1 as-of join matches per-user brute force (latest click at-or-before each purchase)") {
    import org.apache.spark.sql.{functions => F}
    val ev = Tables.events(spark, sfDir)
      .select(F.col("event_id"), F.col("user_id"), F.expr("ts div 1000").as("us"), F.col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // brute force: collapse click ties to max event_id per (user, us) first,
    // exactly as the operator documents
    val clicks = ev.filter(_._4 == "click").groupBy(e => (e._2, e._3))
      .map { case ((u, us), es) => (u, us, es.map(_._1).max) }.toSeq
    val expected = ev.filter(_._4 == "purchase").flatMap { case (pid, u, pus, _) =>
      val prior = clicks.filter(c => c._1 == u && c._2 <= pus)
      if (prior.isEmpty) None
      else {
        val best = prior.maxBy(c => (c._2, c._3))
        Some((pid, u, best._3, pus - best._2))
      }
    }.sortBy(_._1).toSeq

    val got = PipelineOps.p1AsofAttribution(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("p1 plan is union+window with ONE hash shuffle, never a range/cartesian join") {
    val plan = PipelineOps.p1AsofAttribution(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "SortMergeJoin"
    // the whole as-of costs one shuffle by user (the trailing range
    // exchange is only the presentation orderBy)
    withClue(plan) {
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    }
  }

  test("p2/p3/p4 are narrow: no hash-partition shuffle in the plan") {
    Seq(
      PipelineOps.p2StratifiedSample(spark, sfDir),
      PipelineOps.p3TokenChunks(spark, sfDir),
      PipelineOps.p4Redact(spark, sfDir)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      withClue(plan) { plan should not include "hashpartitioning" }
    }
  }

  test("p2 sampling is deterministic and stratified (en rate < default rate)") {
    val df = PipelineOps.p2StratifiedSample(spark, sfDir)
    val a = df.collect().map(_.getLong(0)).toSeq
    val b = PipelineOps.p2StratifiedSample(spark, sfDir).collect().map(_.getLong(0)).toSeq
    a shouldBe b // pure function of the data, not rand()
    val total = Tables.documents(spark, sfDir).count()
    a.size.toLong should be < total
  }

  test("p3 chunking covers every word exactly once") {
    import org.apache.spark.sql.{functions => F}
    val totWords = Tables.documents(spark, sfDir)
      .select(F.sum(F.size(F.split(F.col("text"), " ")))).collect()(0).getLong(0)
    val chunkWords = PipelineOps.p3TokenChunks(spark, sfDir)
      .select(F.sum(F.col("n_words"))).collect()(0).getLong(0)
    assert(chunkWords == totWords)
  }

  test("chunker properties on random corpora: conservation, bound, reconstruction") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "x1", "y2")
    val docs = (0 until 40).map { id =>
      val n = rng.nextInt(70) + 1 // 1..70 words — covers <1 chunk and >2 chunks
      (id.toLong, Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = PipelineOps.tokenChunks(df, chunkWords = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    chunks.foreach { case (_, _, chunk, n) =>
      n should be <= 8L
      n should be >= 1L
      chunk.split(" ").length.toLong shouldBe n
    }
    // per-doc: chunks reassemble the original text in chunk_id order
    docs.foreach { case (id, text) =>
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      mine.map(_._3).mkString(" ") shouldBe text
      mine.map(_._4).sum shouldBe text.split(" ").length.toLong
    }
  }

  test("p12 overlap chunker: stride placement, size bound, full coverage with overlap") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    val docs = (0 until 40).map { id =>
      val n = rng.nextInt(90) + 1 // spans <1 window up to several strides
      (id.toLong, (0 until n).map(i => s"w$i").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = PipelineOps.overlapChunks(df, chunkWords = 8, stride = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    chunks.foreach { case (_, _, chunk, n) =>
      n should be <= 8L
      n should be >= 1L
      chunk.split(" ").length.toLong shouldBe n
    }
    docs.foreach { case (id, text) =>
      val ws = text.split(" ")
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      // chunk i is exactly words [i*stride, i*stride+size)
      mine.foreach { case (_, cid, chunk, _) =>
        chunk shouldBe ws.slice((cid * 5).toInt, (cid * 5).toInt + 8).mkString(" ")
      }
      // consecutive chunks overlap by size − stride (3) except the tail
      mine.sliding(2).foreach {
        case Array((_, _, a, na), (_, _, b, _)) if na == 8 =>
          a.split(" ").drop(5).mkString(" ") shouldBe b.split(" ").take(3).mkString(" ")
        case _ => ()
      }
      // every word is covered (first word of each stride window walks the doc)
      mine.map(_._2).toSeq shouldBe (0L until ((ws.length - 1) / 5 + 1).toLong)
    }
  }

  test("p11 packing matches the sequential per-shard sweep; offsets are gapless") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def shardOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val offsets = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    val expected = docs.map { case (id, text) =>
      val sh = shardOf(id)
      val n = text.split(" ", -1).length.toLong
      val off = offsets(sh)
      offsets(sh) = off + n
      (id, sh, n, off, off / 512, (off + n - 1) / 512 - off / 512 + 1)
    }.toSeq

    val got = PipelineOps.p11PackSequences(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    got.foreach { case (_, _, n, _, _, nSeqs) =>
      // a doc spans ceil-ish many 512-token sequences, never zero
      nSeqs should be >= 1L
      nSeqs should be <= (n / 512 + 2)
    }
  }

  test("p11 plan: one hash exchange (the shard window); no join") {
    val plan = PipelineOps.p11PackSequences(spark, sfDir)
      .queryExecution.executedPlan.toString
    withClue(s"p11 plan:\n$plan\n") {
      plan should include("Window")
      plan should not include "Join"
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    }
  }

  test("p4 masks exactly the denylist terms") {
    val rows = PipelineOps.p4Redact(spark, sfDir).collect()
    rows.foreach { r =>
      val redacted = r.getString(1)
      redacted.split(" ") should contain noneOf ("customer", "order", "value", "key")
      val masks = "<MASKED>".r.findAllIn(redacted).size
      masks shouldBe r.getLong(2)
    }
  }
}
