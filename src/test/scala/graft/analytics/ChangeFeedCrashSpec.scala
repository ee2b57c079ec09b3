package graft.analytics

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Real-JVM death in the one-pass merge + change-feed window
  * (ChangeFeedReplaySpec simulates the same windows with a thrown
  * exception; this spec, following the CompactionCrashSpec standard,
  * kills an actual JVM at the [[KeyedMerge.crashHook]] point between
  * the feed publish and the merged write) and proves, from
  * first-principles expected contents:
  *
  *   - the crash leaves EXACTLY the documented on-disk state: the
  *     batch's feed delta durably published (`_SUCCESS` present), the
  *     state table untouched;
  *   - the at-least-once replay skips the feed rewrite on the marker
  *     and completes the merge — no double emission, no lost
  *     transitions, no state divergence;
  *   - the stale-change row (older seq than the stored winner) never
  *     emits and never regresses the state, crash or no crash.
  */
class ChangeFeedCrashSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  private def spawn(mode: String, work: String, table: String,
      feed: String): Int = {
    val java = new File(new File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.analytics.ChangeFeedCrashMain", mode, table, feed)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new File(work, s"$mode.log"))
    pb.start().waitFor()
  }

  private def feedSet(feed: String): Set[(Long, String, Long, Double, Double)] =
    spark.read.parquet(feed).collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[String]("change"),
        r.getAs[Long]("k"), r.getAs[Double]("old_v"), r.getAs[Double]("new_v")))
      .toSet

  private def state(table: String): Set[(Long, Long, Double)] =
    KeyedMerge.read(spark, table).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("seq"), r.getAs[Double]("v")))
      .toSet

  // first-principles expectations from ChangeFeedCrashMain.batch
  private val feed0 = Set(
    (0L, "added", 1L, 0.0, 10.0), (0L, "added", 2L, 0.0, 20.0),
    (0L, "added", 3L, 0.0, 30.0))
  private val feed1 = Set(
    (1L, "updated", 1L, 10.0, 11.0), (1L, "deleted", 2L, 20.0, 0.0),
    (1L, "added", 9L, 0.0, 90.0)) // the stale (3, seq 0) row emits NOTHING
  private val state0 = Set((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0))
  private val state1 = Set((1L, 2L, 11.0), (3L, 1L, 30.0), (9L, 2L, 90.0))

  test("JVM death between feed publish and merge; the replay skips the feed and completes the merge") {
    val work = Files.createTempDirectory("graft-changefeed-crash").toString
    val table = s"$work/table"; val feed = s"$work/feed"

    spawn("seed", work, table, feed) shouldBe 0
    feedSet(feed) shouldBe feed0
    state(table) shouldBe state0

    // the window: batch 1's feed is durably committed, the merge never ran
    spawn("crash-after-feed", work, table, feed) shouldBe 137
    new File(s"$feed/delta=1/_SUCCESS").exists() shouldBe true
    feedSet(feed) shouldBe (feed0 ++ feed1)
    state(table) shouldBe state0

    // at-least-once replay: marker skip + merge completion
    spawn("resume", work, table, feed) shouldBe 0
    feedSet(feed) shouldBe (feed0 ++ feed1)
    state(table) shouldBe state1
    // tombstone retained in the raw table (the delete must keep beating
    // older-seq changes in any later batch)
    spark.read.parquet(table).filter(col(KeyedMerge.OpCol) === "d")
      .select(col("k")).collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
  }
}
