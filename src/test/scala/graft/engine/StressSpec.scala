package graft.engine

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core._
import graft.monitoring.TestMonitoringHarness
import graft.processor.RecordProcessor
import graft.sources.InMemorySourceClient

/** The BASELINE stress gate — mirror of the reference's parallel stress
  * test (`/root/reference/src/tests/test_suite.rs:708-815`, BASELINE.md
  * row 1): 8 shards × 80 records = 640 records, batch_size 10, including
  * per-record retry paths, fully processed in < 5 s wall with 0 errors. */
class StressSpec extends AnyFunSuite with Matchers with SparkSpec {
  import StressSpec._

  test("stress: 640 records / 8 shards / batch 10, with retries, < 5 s, 0 errors") {
    val s = spark; import s.implicits._
    val shards = (0 until 8).map { sh =>
      s"shard-$sh" -> (0 until 80).map(i =>
        KRecord(f"$i%010d", s"pk-$i", s"payload-$sh-$i".getBytes("UTF-8"), None, s"shard-$sh"))
    }.toMap
    val store = new InMemoryCheckpointStore
    val harness = new TestMonitoringHarness

    def runOnce(collect: Boolean): (Long, Long) = {
      processedCount.set(0)
      val gp = new GraftProcessor[String](
        ProcessorConfig("stress", batchSize = 10, maxConcurrentShards = Some(8)),
        new RetryingEcho,
        new InMemorySourceClient(shards),
        if (collect) store else new InMemoryCheckpointStore,
        sink = if (collect) harness else graft.monitoring.EventSink.Noop,
        onItems = (ds, _) => { processedCount.addAndGet(ds.count()); () })
      val t0 = System.nanoTime()
      gp.run(spark, Files.createTempDirectory("stress").toString) shouldBe Right(())
      ((System.nanoTime() - t0) / 1000000L, processedCount.get())
    }

    runOnce(collect = false) // JIT/codegen warm-up, not measured (mock-I/O baseline is a warm process)
    val (wallMs, n) = runOnce(collect = true)

    n shouldBe 640L
    store.all.keySet shouldBe (0 until 8).map(s => s"shard-$s").toSet
    store.all.values.toSet shouldBe Set("0000000079")
    // 0 hard errors; soft retries DID happen (the retry path is exercised)
    harness.events.count(_.eventType.isInstanceOf[
      graft.monitoring.ProcessingEventType.RecordFailure]) shouldBe 0
    val softs = harness.events.map(_.eventType).collect {
      case a: graft.monitoring.ProcessingEventType.RecordAttempt if !a.success => a
    }
    softs.length shouldBe (8 * 8 * 2) // every 10th record soft-fails twice
    info(s"stress wall: ${wallMs}ms for 640 records across 8 shards")
    wallMs should be < 5000L
  }
}

object StressSpec {
  val processedCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Every 10th record soft-fails twice before succeeding — the reference
    * stress mix includes retry paths (`test_suite.rs:728-741`). */
  final class RetryingEcho extends RecordProcessor[String] {
    override def processRecord(r: KRecord, m: RecordMetadata) =
      if (r.sequenceNumber.endsWith("0") && m.attemptNumber < 2)
        Left(ProcessingError.SoftFailure(s"transient ${m.attemptNumber}"))
      else Right(Some(r.dataUtf8))
  }
}
