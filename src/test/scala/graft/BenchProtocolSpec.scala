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
      "new" -> 99.0) // no baseline — new entries are not ratio-flagged
    Bench.flaggedForIsolation(current, prior, 1.4) shouldBe Seq("b")
    // a zero/negative prior can never flag (division-free rule)
    Bench.flaggedForIsolation(Map("z" -> 5.0), Map("z" -> 0.0), 1.4) shouldBe
      empty
    // no baseline at all -> nothing ratio-flagged (static set still runs)
    Bench.flaggedForIsolation(current, Map.empty, 1.4) shouldBe empty
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
