package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property gate for the overflow-safe `(a*b) div c` staging (ADVICE
  * r11): the 20-bit-limb long division must equal exact BigInt
  * arithmetic everywhere inside its documented envelope (`a*b < 2^83`,
  * `b + c < 2^43`) — including the regions where the naive product
  * wraps Long, which is exactly where the s21/p22 gates would silently
  * corrupt at large SF. The replay mirrors the emitted SQL text
  * operation-for-operation in Long arithmetic, so a wrapped
  * intermediate shows up as a BigInt mismatch.
  */
class ExactMathSpec extends AnyFunSuite with Matchers {

  private val K = 1048576L

  /** The emitted SQL, replayed in Long ops (div/mod/mul/add only). */
  private def mulDivLong(a: Long, b: Long, c: Long): Long = {
    val q1 = (b * (a / K)) / c
    val mixed = ((b * (a / K)) % c) * K + b * (a % K)
    q1 * K + mixed / c
  }
  private def mulModLong(a: Long, b: Long, c: Long): Long = {
    val mixed = ((b * (a / K)) % c) * K + b * (a % K)
    mixed % c
  }

  private def check(a: Long, b: Long, c: Long): Unit = {
    val exactDiv = (BigInt(a) * b / c).toLong
    val exactMod = (BigInt(a) * b % c).toLong
    withClue(s"a=$a b=$b c=$c: ") {
      mulDivLong(a, b, c) shouldBe exactDiv
      mulModLong(a, b, c) shouldBe exactMod
    }
  }

  test("equals BigInt on 20k random triples across the envelope, incl. naive-overflow region") {
    val rnd = new scala.util.Random(0xE1ACD)
    var overflowRegion = 0
    (1 to 20000).foreach { _ =>
      // draw b+c < 2^43, then a under the a*b < 2^83 cap
      val b = math.abs(rnd.nextLong()) % (1L << 42) + 1
      val c = math.abs(rnd.nextLong()) % ((1L << 43) - b - 1) + 1
      val aCap = (BigInt(1) << 83) / b - 1
      val a = (BigInt(math.abs(rnd.nextLong())) % aCap.min(BigInt(Long.MaxValue))).toLong
      if (BigInt(a) * b > BigInt(Long.MaxValue)) overflowRegion += 1
      check(a, b, c)
    }
    // the draw must actually exercise the region the naive product wraps
    overflowRegion should be > 2000
  }

  test("edges: zeros, ones, envelope boundaries, gate instantiations") {
    check(0L, 12345L, 7L)
    check(12345L, 0L, 7L)
    check(7L, 7L, 1L)
    check(K - 1, K - 1, K - 1)
    // s21 shape: a = t_total huge, b <= 2^20, c = t_s near its 2^43 bound
    check((1L << 62) - 1, (1L << 20) - 1, (1L << 42) + 12345L)
    // p22-anneal shape near the documented corpus bound (~2^43.5 bigrams):
    // ann_b = tm div 5, head_mass ~ th/4, th ~ tm/3
    val tm = (1L << 43) + (1L << 42)
    check(tm / 5, tm / 12 + 7, tm / 3 + 1)
    // exact divisibility and off-by-one straddles
    check(1L << 41, 1L << 41, 1L << 40)
    check((1L << 41) + 1, (1L << 41) - 1, (1L << 40) + 3)
  }
}
