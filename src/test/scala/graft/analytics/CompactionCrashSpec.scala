package graft.analytics

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Maintenance-window chaos (VERDICT r12 #4): DriverCrashSpec pins the
  * sink-write↔checkpoint-save window and KeyedMergeSpec pins a
  * SIMULATED partial delta, but no test killed a real JVM between
  * `commitDelta` and `compactUpTo`, or mid-compaction. This spec chains
  * five spawned-JVM deaths through every window of the real protocol
  * (see [[CompactionCrashMain]]) and proves:
  *
  *   - each crash leaves EXACTLY the documented on-disk state (durable
  *     temp + pending publish; durable snapshot + partial retire; full
  *     retire + pending publish);
  *   - the next run recovers the partial delta AND the compaction claim
  *     with no special-case code — the protocol's own marker checks do
  *     all the work;
  *   - the drained table matches the LWW oracle (f8's merge semantics,
  *     re-derived here from the intended batch contents from first
  *     principles) and `readAsOf(3)` is bit-identical before and after
  *     the crash-riddled compaction — the scaladoc's invariant.
  */
class CompactionCrashSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  private def spawn(mode: String, work: String, table: String): Int = {
    val java = new File(new File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.analytics.CompactionCrashMain", mode, table)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new File(work, s"$mode.log"))
    pb.start().waitFor()
  }

  /** First-principles LWW oracle over the intended batches 0..asOf:
    * per key, the (seq, delta-order) winner; tombstones delete. */
  private def lwwOracle(asOf: Long): Set[(Long, Long, Double)] =
    (0L to asOf).flatMap(v => CompactionCrashMain.batch(v))
      .groupBy(_._1).flatMap { case (k, rows) =>
        val (_, seq, op, v) = rows.maxBy { case (_, s, o, vv) => (s, o, vv) }
        if (op == "d") None else Some((k, seq, v))
      }.toSet

  private def readState(table: String, asOf: Long): Set[(Long, Long, Double)] =
    VersionedTable.readAsOf(spark, table, CompactionCrashMain.Keys,
      CompactionCrashMain.Seqs, asOf)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("seq"),
        r.getAs[Double]("v"))).toSet

  private def entries(table: String): Seq[String] =
    Option(new File(table).listFiles()).toSeq.flatten.map(_.getName).sorted

  test("five JVM deaths through the commit/compaction windows; the log drains to the LWW oracle") {
    val work = Files.createTempDirectory("graft-compaction-crash").toString
    val table = s"$work/table"

    spawn("seed", work, table) shouldBe 0
    entries(table).filter(_.startsWith("delta=")) shouldBe
      Seq("delta=0", "delta=1", "delta=2")

    // -- window 1: die with delta 3 durable but unpublished
    spawn("crash-commit", work, table) shouldBe 137
    withClue(s"layout after crash-commit: ${entries(table)}: ") {
      entries(table) should contain(".tmp_delta_3")
      entries(table) should not contain "delta=3"
      // the durable temp is a COMPLETE write (its own job marker landed)
      new File(s"$table/.tmp_delta_3/_SUCCESS").exists() shouldBe true
    }
    // readers are oblivious: the hidden temp is invisible to as-of reads
    readState(table, 99L) shouldBe lwwOracle(2L)

    // -- window 2: recover + publish delta 3, die before compaction
    spawn("crash-between", work, table) shouldBe 137
    entries(table) should not contain ".tmp_delta_3"
    entries(table).filter(_.startsWith("delta=")) shouldBe
      Seq("delta=0", "delta=1", "delta=2", "delta=3")
    // the pre-compaction snapshot the compaction must preserve verbatim
    val asOf3Before = readState(table, 3L)
    asOf3Before shouldBe lwwOracle(3L)

    // -- window 3: die mid-retire (snapshot durable, log partially gone;
    // the retire ORDER is listStatus-dependent, so pin only what the
    // protocol guarantees: the snapshot marker is durable, the hooked
    // delta=1 is gone, and nothing above k was touched)
    spawn("crash-retire", work, table) shouldBe 137
    withClue(s"layout after crash-retire: ${entries(table)}: ") {
      new File(s"$table/.compact_upto_3/_SUCCESS").exists() shouldBe true
      val left = entries(table).filter(_.startsWith("delta="))
      left should not contain "delta=1"
      left.size should be < 4
      left.toSet.subsetOf(Set("delta=0", "delta=2", "delta=3")) shouldBe true
    }

    // -- window 4: resume skips phase 1 on the marker, dies pre-publish
    spawn("crash-publish", work, table) shouldBe 137
    withClue(s"layout after crash-publish: ${entries(table)}: ") {
      new File(s"$table/.compact_upto_3/_SUCCESS").exists() shouldBe true
      entries(table).filter(_.startsWith("delta=")) shouldBe empty
    }

    // -- recovery run: a new delta lands AND the compaction completes
    spawn("resume", work, table) shouldBe 0
    withClue(s"layout after resume: ${entries(table)}: ") {
      entries(table).filter(_.startsWith("delta=")) shouldBe
        Seq("delta=3", "delta=4")
      entries(table).filterNot(_.startsWith("delta=")) shouldBe empty
    }

    // the compaction claim: as-of 3 is bit-identical across the whole
    // crash-riddled maintenance cycle, and the drained table equals the
    // first-principles LWW oracle (f8's merge semantics)
    readState(table, 3L) shouldBe asOf3Before
    readState(table, 99L) shouldBe lwwOracle(4L)
    // the retained-tombstone adversaries: key 5's older-seq upsert must
    // stay dead, key 6's post-tombstone resurrection must be alive
    readState(table, 99L).map(_._1) should not contain 5L
    readState(table, 99L).find(_._1 == 6L).map(_._3) shouldBe Some(606.0)
  }
}
