package graft.engine

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Driver-crash commit window (VERDICT r10 #2). ChaosSpec kills tasks and
  * executor JVMs; the remaining fault axis is the DRIVER dying between
  * sink write and app-checkpoint save — the at-least-once window K4
  * defines (`/root/reference/src/processor.rs:1561-1629`). The scenario
  * spawns [[DriverCrashMain]] twice:
  *
  *   run 1 (`crash`): halts the driver JVM on the 10th checkpoint save —
  *   epoch 3's items are in both sinks, shard-0's epoch-3 checkpoint is
  *   persisted, shards 1–3 are still at their epoch-2 sequence;
  *
  *   run 2 (`resume`): fresh streaming checkpoint (driver scratch lost),
  *   SAME durable FileCheckpointStore → checkpoint-wins resume (O6).
  *
  * Gates: re-delivery is EXACTLY the uncommitted range per shard (from
  * the stored sequence + 1 through the end, each record once); the raw
  * append log shows the replayed records twice across runs (the window
  * is real); and the KeyedMerge table — the idempotent sink — holds each
  * (shard, seq) exactly once: the replayed epoch did not double-count. */
class DriverCrashSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  private def spawn(mode: String, work: String): Int = {
    val java = new File(new File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.engine.DriverCrashMain", mode, work)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new File(work, s"$mode.log"))
    pb.start().waitFor()
  }

  private def storedSeq(work: String, shard: String): Option[String] = {
    val f = new File(s"$work/store/$shard.ckpt")
    if (f.isFile) Some(new String(Files.readAllBytes(f.toPath), "UTF-8").trim)
    else None
  }

  test("driver halt mid-commit: resume re-delivers exactly the uncommitted range; keyed sink single-counts") {
    val work = Files.createTempDirectory("graft-driver-crash").toString

    // -- run 1: the driver dies inside the commit loop
    spawn("crash", work) shouldBe 137

    // the crash left the store mid-epoch-3: shard-0 committed at sequence
    // 29 (save 9), shards 1-3 still at 19 (saves 10-12 never persisted)
    val atCrash = (0 until DriverCrashMain.Shards)
      .map(i => s"shard-$i" -> storedSeq(work, s"shard-$i")).toMap
    atCrash("shard-0") shouldBe Some("0000000029")
    (1 until DriverCrashMain.Shards).foreach { i =>
      atCrash(s"shard-$i") shouldBe Some("0000000019")
    }
    // epoch 3's items are ALREADY in the raw sink (sink write preceded
    // the saves): runs 1 delivered sequences 0-29 on every shard
    val run1 = spark.read.parquet(s"$work/deliveries/run1")
      .collect().map(r => (r.getString(0), r.getString(1)))
    run1.length shouldBe DriverCrashMain.Shards * 30
    run1.toSet.size shouldBe run1.length

    // -- run 2: restart against the same durable store
    spawn("resume", work) shouldBe 0

    // re-delivery is EXACTLY the uncommitted range, each record once:
    // shard-0 from 30, shards 1-3 from 20 (their epoch-3 replay)
    val run2 = spark.read.parquet(s"$work/deliveries/run2")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = (0 until DriverCrashMain.Shards).flatMap { i =>
      val from = if (i == 0) 30 else 20
      (from until DriverCrashMain.PerShard).map(s => (s"shard-$i", f"$s%010d"))
    }.toSet
    withClue("resume must re-deliver the uncommitted range, nothing else: ") {
      run2.toSet shouldBe expected
    }
    run2.length shouldBe expected.size // and nothing twice within the run

    // the at-least-once window was REAL: shards 1-3's epoch-3 records
    // (sequences 20-29) were delivered in BOTH runs
    val replayed = run1.toSet intersect run2.toSet
    replayed.size shouldBe (DriverCrashMain.Shards - 1) * 10

    // ...but the idempotent keyed sink single-counted everything
    val table = graft.analytics.KeyedMerge.read(spark, s"$work/table")
      .collect().map(r => (r.getAs[String]("shard"), r.getAs[String]("seq")))
    table.length shouldBe DriverCrashMain.Shards * DriverCrashMain.PerShard
    table.toSet.size shouldBe table.length

    // and the store drained to the final sequence on every shard
    (0 until DriverCrashMain.Shards).foreach { i =>
      storedSeq(work, s"shard-$i") shouldBe Some("0000000059")
    }
  }
}
