package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests over the native expressions' eval paths (pure JVM, no
  * Spark session; seeded generators — deterministic). Algebraic invariants
  * the codegen twins share via FunctionsSpec's native==composed checks. */
class ExpressionPropertiesSpec extends AnyFunSuite with Matchers {

  private val rng = new scala.util.Random(42)
  private def longSet(maxLen: Int = 60): Array[Long] =
    Array.fill(rng.nextInt(maxLen))(rng.nextLong() / 2).distinct.sorted

  test("jaccard merge-walk equals set-based jaccard on sorted distinct arrays") {
    val j = JaccardSorted(null, null)
    (1 to 300).foreach { _ =>
      val a = longSet(); val b = longSet()
      val native = j.nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
        .asInstanceOf[Double]
      val sa = a.toSet; val sb = b.toSet
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      native shouldBe expected
    }
  }

  test("minhash signature is elementwise monotone under set union (LSH soundness)") {
    (1 to 200).foreach { _ =>
      val a = longSet(); val b = longSet()
      val sigUnion = MinHashConstants.signatureOf((a ++ b).distinct)
      val sigA = MinHashConstants.signatureOf(a)
      if (a.nonEmpty) {
        // min over a superset can only be <= — what LSH banding relies on
        sigUnion.zip(sigA).foreach { case (u, x) => u should be <= x }
      }
    }
  }

  test("identical shingle sets always produce identical signatures and band keys") {
    (1 to 200).foreach { _ =>
      val a = longSet()
      MinHashConstants.signatureOf(a) shouldBe MinHashConstants.signatureOf(a.clone())
    }
  }

  test("simhash is invariant under token permutation (bit votes commute)") {
    val s = SimHash64(null)
    (1 to 200).foreach { _ =>
      val tokens = Array.fill(rng.nextInt(100) + 1)(rng.nextLong())
      val shuffled = rng.shuffle(tokens.toSeq).toArray
      s.nullSafeEval(new GenericArrayData(tokens)) shouldBe
        s.nullSafeEval(new GenericArrayData(shuffled))
    }
  }

  test("hyperplane signature is invariant under positive scaling (cosine LSH property)") {
    (1 to 200).foreach { _ =>
      val v = Array.fill(64)((rng.nextInt(2001) - 1000) / 100.0)
      val k = rng.nextInt(1000) + 1
      HyperplaneConstants.signatureOf(new GenericArrayData(v)) shouldBe
        HyperplaneConstants.signatureOf(new GenericArrayData(v.map(_ * k)))
    }
  }

  test("minhash products can never overflow a long (ANSI safety)") {
    // 30-bit masked hash × (p−1) multiplier + (p−1) offset < 2^61
    MinHashConstants.A.zip(MinHashConstants.B).foreach { case (a, b) =>
      val maxProduct = 0x3FFFFFFFL * a + b
      maxProduct should be > 0L // no wraparound at the extreme input
      a should be >= 1L
      a should be < MinHashConstants.P
      b should be < MinHashConstants.P
    }
  }

  test("per-pair row-match count concentrates around 64·J (independence, not just E[match]=J)") {
    // The sharp pin the aggregate rate can't give: the broken pre-r5 family
    // ALSO satisfied E[row match] ≈ J — but per pair it was all-or-nothing
    // (the single shared argmin either wins both sets in every row, or in
    // none: counts ∈ {0, 64}). Independent permutations concentrate each
    // pair's count binomially around 64·J. For J = 2/3 (shared 160 of 240):
    // sd = √(64·(2/3)·(1/3)) ≈ 3.8, so [20, 60] is a ±6σ corridor — the
    // broken family lands outside it on EVERY trial.
    (1 to 20).foreach { _ =>
      val shared = Array.fill(160)(rng.nextLong())
      val a = shared ++ Array.fill(40)(rng.nextLong())
      val b = shared ++ Array.fill(40)(rng.nextLong())
      val sa = MinHashConstants.signatureOf(a)
      val sb = MinHashConstants.signatureOf(b)
      val matches = sa.zip(sb).count { case (x, y) => x == y }
      matches should be >= 20
      matches should be <= 60
    }
  }

  test("the 64 hash rows are independent permutations, not one (r5 regression)") {
    // The pre-r5 family x·A(h)+B(h) never overflowed, so every row was
    // MONOTONE in x and all 64 rows picked the same argmin element —
    // collapsing banding recall from 1−(1−J²)^32 to ≈J (five J≈0.9 pairs
    // escaped at sf0.1). Two pins:
    // 1. rows disagree on their argmin element for random sets;
    // 2. every random pair with J ≥ 0.8 shares at least one 2-row band
    //    (P(miss) ≤ (1−0.64)^32 ≈ 1e-14 per pair — deterministic in
    //    practice; the broken family failed this for ~15% of pairs).
    (1 to 100).foreach { _ =>
      val base = Array.fill(200)(rng.nextLong())
      val sig = MinHashConstants.signatureOf(base)
      val argmins = (0 until MinHashConstants.numHashes).map { h =>
        base.minBy(x => ((x & 0x3FFFFFFFL) * MinHashConstants.A(h) +
          MinHashConstants.B(h)) % MinHashConstants.P)
      }
      argmins.distinct.size should be > 1
      // signature matches the per-row argmin derivation
      sig.zipWithIndex.foreach { case (v, h) =>
        v shouldBe ((argmins(h) & 0x3FFFFFFFL) * MinHashConstants.A(h) +
          MinHashConstants.B(h)) % MinHashConstants.P
      }
      // J = 0.8 near-dup pair: drop 20 of 200 elements, add 20 fresh ones
      val other = base.drop(20) ++ Array.fill(20)(rng.nextLong())
      val sigB = MinHashConstants.signatureOf(other)
      val bandMatch = (0 until 32).exists(b =>
        sig(2 * b) == sigB(2 * b) && sig(2 * b + 1) == sigB(2 * b + 1))
      bandMatch shouldBe true
    }
  }
}
