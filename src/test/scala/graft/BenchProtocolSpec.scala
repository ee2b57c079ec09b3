package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the dispersion-proofing protocol of the bench artifact
  * (VERDICT r11 #1): the ratio-flagging rule against the prior round's
  * committed artifact, the baseline parser over the machine-generated
  * line format, and the dispersion index — so BENCH_r{N} regression
  * calls are made on quiesced isolated numbers, never on the in-run
  * sequential sweep (this rig shows 1.3–1.7× boot-wide sweep dispersion
  * with disjoint outlier sets; SCALE.md).
  */
class BenchProtocolSpec extends AnyFunSuite with Matchers {

  test("parseBaselineQueries reads the committed artifact line format") {
    val line = """{"metric":"total","value":116.9,"unit":"sec","queries":{"q1_agg":0.5611,"d7_x":2.9239,"f6_y":1.2},"queries_max":{"q1_agg":0.9},"failed_queries":[],"runs":2,"sf":"/root/testdata/sf0.1"}"""
    Bench.parseBaselineQueries(line) shouldBe Map(
      "q1_agg" -> 0.5611, "d7_x" -> 2.9239, "f6_y" -> 1.2)
  }

  test("baseline priors take min(inrun, isolated) per entry — inflated in-run priors must not mask regressions") {
    // r14 lesson: g1 read 11.5 s in-run (2x its r13 isolated 5.6 s) and
    // went unflagged because the r13 IN-RUN prior was a noisy 23.3 s.
    // The prior is the artifact's best evidence: isolated where present
    // and successful, in-run otherwise. A -1 isolated (failed re-run)
    // never becomes a prior; the nested per-entry "isolated" fields
    // inside the "flagged" ledger must not confuse the parser (the
    // top-level map comes first in the line format).
    val line = """{"metric":"total","value":50.0,"queries":{"g1":23.28,"ok":1.0,"bad":2.0},"queries_max":{"g1":30.0},"isolated":{"g1":5.61,"bad":-1.0},"flagged":{"g1":{"prior":20.0,"inrun":23.28,"isolated":5.61}},"runs":2}"""
    Bench.parseBaselineQueries(line) shouldBe Map(
      "g1" -> 5.61, "ok" -> 1.0, "bad" -> 2.0)
  }

  test("parseBaselineQueries never throws on malformed input — empty map disables flagging") {
    Bench.parseBaselineQueries("") shouldBe empty
    Bench.parseBaselineQueries("{}") shouldBe empty
    Bench.parseBaselineQueries("""{"queries":null}""") shouldBe empty
    Bench.parseBaselineQueries("""{"queries":{""") shouldBe empty
  }

  test("flaggedForIsolation flags exactly the >threshold regressions") {
    val prior = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "gone" -> 1.0)
    val current = Map(
      "a" -> 1.39, // under 1.4x — not flagged
      "b" -> 1.41, // over — flagged
      "c" -> -1.0, // failed in-run — the failure list owns it, not iso
      "new" -> 99.0) // no prior ratio — newEntries owns it (below)
    Bench.flaggedForIsolation(current, prior, 1.4) shouldBe Seq("b")
    // a zero/negative prior can never flag (division-free rule)
    Bench.flaggedForIsolation(Map("z" -> 5.0), Map("z" -> 0.0), 1.4) shouldBe
      empty
    // no baseline at all -> nothing ratio-flagged (static set still runs)
    Bench.flaggedForIsolation(current, Map.empty, 1.4) shouldBe empty
  }

  test("newEntries: first-round entries are flagged unconditionally (VERDICT r13 #1a)") {
    val prior = Map("a" -> 1.0, "b" -> 1.0)
    val current = Map(
      "a" -> 0.5, // known entry — ratio rules own it
      "s24" -> 13.0, // absent from the baseline — ALWAYS isolated
      "z9" -> 0.01, // new and cheap — still isolated (its first number
      // becomes the next round's prior either way)
      "bad" -> -1.0) // failed in-run — the failure list owns it
    Bench.newEntries(current, prior) shouldBe Seq("s24", "z9")
    // no baseline at all: nothing is "new" — the whole surface is, and
    // the time budget alone must not re-run it twice
    Bench.newEntries(current, Map.empty) shouldBe empty
  }

  test("isolationQueue: time-budgeted, ranked by in-run cost descending (VERDICT r13 #1b)") {
    val inRun = Map("heavy" -> 10.0, "mid" -> 4.0, "cheap1" -> 0.2,
      "cheap2" -> 0.1, "failed" -> -1.0)
    // budget fits heavy (2*10+0.5=20.5) + mid (8.5) + cheap1 (0.9) = 29.9
    // but not cheap2 on top (30.6 > 30): the drop is the CHEAP tail
    val (taken, dropped) = Bench.isolationQueue(
      Seq("cheap2", "cheap1", "mid", "heavy"), inRun, budgetSec = 30.0)
    taken shouldBe Seq("heavy", "mid", "cheap1")
    dropped shouldBe Seq("cheap2")
    // the single most expensive entry is ALWAYS taken, even over budget —
    // a tiny budget degrades to "isolate the worst one", never to nothing
    val (t2, d2) = Bench.isolationQueue(Seq("heavy", "mid"), inRun, 1.0)
    t2 shouldBe Seq("heavy")
    d2 shouldBe Seq("mid")
    // a failed entry re-runs at overhead-only estimated cost (the re-run
    // is the diagnosis — ADVICE r10) and never poisons the ordering
    val (t3, _) = Bench.isolationQueue(Seq("failed", "cheap1"), inRun, 30.0)
    t3 shouldBe Seq("cheap1", "failed")
  }

  test("dispersionIndex: totals over good entries, 1.5x spread count") {
    val rs = Seq(
      "a" -> (1.0, 2.0), // 2.0x spread — counted
      "b" -> (2.0, 2.5), // 1.25x — not
      "c" -> (-1.0, -1.0)) // failed — excluded from both totals
    val (mn, mx, over) = Bench.dispersionIndex(rs)
    mn shouldBe 3.0 +- 1e-9
    mx shouldBe 4.5 +- 1e-9
    over shouldBe 1
  }

  test("shouldContinue: adaptive sampling converges and is bounded") {
    // always reach minRuns
    Bench.shouldContinue(Seq(1.0), 2, 6) shouldBe true
    // stable pair -> stop at minRuns (the pre-r13 cost for heavy entries)
    Bench.shouldContinue(Seq(1.0, 0.99), 2, 6) shouldBe false
    // still descending >3% -> keep sampling
    Bench.shouldContinue(Seq(1.0, 0.5), 2, 6) shouldBe true
    Bench.shouldContinue(Seq(1.0, 0.5, 0.4), 2, 6) shouldBe true
    Bench.shouldContinue(Seq(1.0, 0.5, 0.4, 0.395), 2, 6) shouldBe false
    // hard cap regardless of descent
    Bench.shouldContinue(Seq(5.0, 4.0, 3.0, 2.0, 1.0, 0.5), 2, 6) shouldBe
      false
    // a failed last sample never extends the loop
    Bench.shouldContinue(Seq(1.0, -1.0), 2, 6) shouldBe false
    // first success after failures takes one confirming sample
    Bench.shouldContinue(Seq(-1.0, 0.8), 2, 6) shouldBe true
    Bench.shouldContinue(Seq(-1.0, 0.8, 0.81), 2, 6) shouldBe false
  }

  test("settledTotal: per-entry min(inrun, isolated); failures excluded") {
    val results = Seq(
      "a" -> (10.0, 12.0), // isolated exonerates: settles to 2.0
      "b" -> (3.0, 3.5), // not isolated: settles to its in-run min
      "c" -> (-1.0, -1.0), // failed everywhere: excluded, never a timing
      "d" -> (-1.0, -1.0), // failed in-run, isolated succeeded: 4.0
      "e" -> (1.0, 1.0)) // isolated SLOWER than in-run: keep 1.0
    val iso = Map("a" -> 2.0, "d" -> 4.0, "e" -> 5.0)
    Bench.settledTotal(results, iso) shouldBe 10.0 +- 1e-9
    // no isolation pass at all -> settled == in-run total over good rows
    Bench.settledTotal(results, Map.empty) shouldBe 14.0 +- 1e-9
    // the per-entry view (what the compact stdout tail prints — VERDICT
    // r13 #1c): same min rule, -1 sentinel for never-succeeded entries
    Bench.settledPerEntry(results, iso).toMap shouldBe Map(
      "a" -> 2.0, "b" -> 3.0, "c" -> -1.0, "d" -> 4.0, "e" -> 1.0)
  }

  test("tmpfsFits: conservative 24x-plus-headroom guard") {
    // sf0.1-shaped: 17 MiB input, 126 GiB free -> stage
    Bench.tmpfsFits(17L << 20, 126L << 30) shouldBe true
    // sf30-shaped: ~5.2 GiB input needs >126 GiB headroom -> refuse
    Bench.tmpfsFits(5200L << 20, 126L << 30) shouldBe false
    // zero-byte dir (missing sf path) never stages a pointless tree
    Bench.tmpfsFits(0L, 1L << 30) shouldBe false
  }

  test("copyTree replicates a nested directory byte-for-byte") {
    val src = java.nio.file.Files.createTempDirectory("graft-ct-src")
    val sub = java.nio.file.Files.createDirectories(src.resolve("a/b"))
    java.nio.file.Files.write(sub.resolve("f.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(src.resolve("top.txt"), "hi".getBytes("UTF-8"))
    val dstRoot = java.nio.file.Files.createTempDirectory("graft-ct-dst")
    val dst = dstRoot.resolve("copy")
    Bench.copyTree(src.toFile, dst.toFile)
    java.nio.file.Files.readAllBytes(dst.resolve("a/b/f.bin")).toSeq shouldBe
      Seq[Byte](1, 2, 3)
    new String(java.nio.file.Files.readAllBytes(dst.resolve("top.txt")),
      "UTF-8") shouldBe "hi"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(src.toFile); rm(dstRoot.toFile)
  }

  test("the committed bench.json (prior round) parses to a full query map") {
    // the live baseline the next round's Bench will flag against: if a
    // format change ever breaks the parser, this fails HERE, not as a
    // silently-empty flag set during the graded run
    val f = java.nio.file.Paths.get("bench.json")
    assume(java.nio.file.Files.isReadable(f))
    val m = Bench.parseBaselineQueries(
      new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    m.size should be > 100
    all(m.values) should be >= 0.0
  }
}
