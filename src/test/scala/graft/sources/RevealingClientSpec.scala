package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.KRecord

/** Pins the reshard-simulation decorator behind `s16_stream_reshard`: the
  * first `revealAfterListCalls` listings expose only the parent prefix,
  * every later listing the full set, and record access delegates
  * untouched for hidden shards too (a planned-but-unlisted shard must
  * still be readable — Spark may still hold its offset). */
class RevealingClientSpec extends AnyFunSuite with Matchers {

  private def mk(n: Int): InMemorySourceClient =
    new InMemorySourceClient((0 until n).map(s => s"shard-$s" ->
      (0 until 5).map(i =>
        KRecord(f"$i%010d", "pk", Array[Byte](1), None, s"shard-$s"))).toMap)

  test("listings truncate until the reveal call, then expose everything") {
    val c = new RevealingClient(mk(4), visibleInitially = 2, revealAfterListCalls = 2)
    c.listShards("s").map(_.shardId) shouldBe Seq("shard-0", "shard-1")
    c.listShards("s").map(_.shardId) shouldBe Seq("shard-0", "shard-1")
    c.listShards("s").map(_.shardId) shouldBe
      Seq("shard-0", "shard-1", "shard-2", "shard-3")
    c.listShards("s").map(_.shardId) shouldBe
      Seq("shard-0", "shard-1", "shard-2", "shard-3")
  }

  test("record access delegates for hidden shards") {
    val c = new RevealingClient(mk(4), visibleInitially = 2, revealAfterListCalls = 99)
    c.shardLength("s", "shard-3") shouldBe 5L
    val it = c.iteratorAtIndex("s", "shard-3", 0L)
    c.getRecords(it, 10).records.length shouldBe 5
    c.indexOfIterator("s", "shard-3", it) shouldBe 0L
    c.embeddableRecords("s", "shard-3", 1L, 3L).map(_.length) shouldBe Some(2)
  }
}
