package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.{KRecord, ProcessingError, RecordMetadata}

/** Pins the s3 processor's decode taxonomy (ADVICE r9): a malformed
  * payload must dead-letter through `ProcessingError.HardFailure` — the
  * very contract this processor exists to demonstrate — never escape as an
  * uncaught StringIndexOutOfBounds/NumberFormatException that would crash
  * the task instead of advancing the checkpoint past the poison record. */
class PoisonDecodeSpec extends AnyFunSuite with Matchers {

  private val meta = RecordMetadata("shard-0", "001", 1)
  private def rec(payload: String): KRecord =
    KRecord("001", "pk", payload.getBytes("UTF-8"), None, "shard-0")
  private val p = new StreamingQueries.PoisonFilterProcessor

  test("well-formed payloads decode to the typed pair") {
    p.processRecord(rec("click|3.25"), meta) shouldBe Right(Some(("click", 3.25)))
    p.processRecord(rec("view|0.5|extra-prop"), meta) shouldBe Right(Some(("view", 0.5)))
  }

  test("error events hard-fail (the poison contract)") {
    p.processRecord(rec("error|1.0"), meta) match {
      case Left(_: ProcessingError.HardFailure) => succeed
      case other => fail(s"expected HardFailure, got $other")
    }
  }

  test("malformed payloads hard-fail instead of throwing") {
    // no separator at all / leading separator (empty type)
    for (bad <- Seq("noseparator", "|3.0", "", "click|", "click|not-a-number|x")) {
      p.processRecord(rec(bad), meta) match {
        case Left(_: ProcessingError.HardFailure) => succeed
        case other => fail(s"payload '$bad': expected HardFailure, got $other")
      }
    }
  }
}
