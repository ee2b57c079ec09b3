package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class RetrySpec extends AnyFunSuite {

  // Jitter-bound property mirroring reference retry/backoff.rs:185-206.
  test("exponential backoff stays within jitter bounds and under the cap") {
    val prop = Prop.forAll(Gen.long) { seed =>
      val b = ExponentialBackoff(initialDelayMs = 100, maxDelayMs = 30000,
        multiplier = 2.0, jitterFactor = 0.1, seed = Some(seed))
      (0 to 20).forall { attempt =>
        val base = math.min(100.0 * math.pow(2.0, attempt.toDouble), 30000.0)
        val d = b.delayMs(attempt)
        d >= (base * 0.9).toLong - 1 && d <= 30000L && d <= (base * 1.1).toLong + 1
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("exponential backoff without jitter is the exact formula") {
    val b = ExponentialBackoff(100, 30000, 2.0, jitterFactor = 0.0)
    assert(b.delayMs(0) == 100)
    assert(b.delayMs(1) == 200)
    assert(b.delayMs(4) == 1600)
    assert(b.delayMs(10) == 30000) // capped: 100*2^10 = 102400 > 30000
  }

  test("fixed backoff is constant") {
    val b = FixedBackoff(250)
    assert((0 to 5).map(b.delayMs).forall(_ == 250L))
  }

  test("retry succeeds after transient failures and counts attempts") {
    var calls = 0
    val r = RetryHandle.retry(RetryConfig(Some(5), FixedBackoff(1))) { attempt =>
      calls += 1
      assert(attempt == calls - 1)
      if (calls < 3) sys.error("transient") else "ok"
    }
    assert(r == Right("ok"))
    assert(calls == 3)
  }

  test("retry exhausts bounded attempts (maxRetries=N means N+1 calls)") {
    var calls = 0
    val r = RetryHandle.retry(RetryConfig(Some(2), FixedBackoff(1))) { _ =>
      calls += 1; sys.error("always")
    }
    assert(calls == 3)
    r match {
      case Left(RetryError.ExhaustedRetries(2, _)) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("retry is interrupted by shutdown during backoff (reference retry/mod.rs:125-288)") {
    val shutdown = new ShutdownSignal
    val t0 = System.nanoTime()
    val t = new Thread(() => { Thread.sleep(50); shutdown.trigger() })
    t.start()
    val r = RetryHandle.retry(RetryConfig(None, FixedBackoff(60000)), shutdown) { _ =>
      sys.error("always fails")
    }
    t.join()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(r.isLeft)
    assert(r.swap.exists(_.isInstanceOf[RetryError.Interrupted]))
    assert(elapsedMs < 5000, s"shutdown should interrupt the 60s backoff, took ${elapsedMs}ms")
  }

  test("infinite retry keeps going past any bounded count") {
    var calls = 0
    val r = RetryHandle.retry(RetryConfig(None, FixedBackoff(0))) { _ =>
      calls += 1
      if (calls < 50) sys.error("transient") else calls
    }
    assert(r == Right(50))
  }
}
