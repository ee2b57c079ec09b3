package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core._
import graft.monitoring.{EventSink, IteratorEventType, ProcessingEventType}

/** The custom micro-batch source: S1-S4 + O5/O6/O7/O9 semantics.
  * Mirrors: checkpoint recovery (`tests/test_suite2.rs:117-168`), reshard
  * pickup (`test_suite2.rs:53-114`), iterator-expiry recovery
  * (`test_suite2.rs:170`), initial positions (`initial_position_tests.rs`). */
class GraftStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def rec(shard: String, i: Int): KRecord =
    KRecord(f"$i%010d", s"pk-$i", s"payload-$i".getBytes("UTF-8"), None, shard)

  private def mkShards(n: Int, per: Int): Map[String, IndexedSeq[KRecord]] =
    (0 until n).map(s => s"shard-$s" -> (0 until per).map(i => rec(s"shard-$s", i))).toMap

  private def tmpDir(): String = Files.createTempDirectory("graft-spec").toString

  private def readAll(clientKey: String, extraOptions: Map[String, String] = Map.empty,
      checkpointDir: String = tmpDir()): Long = {
    val reader = spark.readStream.format("graft-stream").option("client", clientKey)
    extraOptions.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream.format("memory").queryName("graft_read_all")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val n = spark.sql("SELECT count(*) FROM graft_read_all").head().getLong(0)
    spark.sql("DROP TABLE IF EXISTS graft_read_all")
    n
  }

  test("AvailableNow drains all shards exactly once (S3/S4/O9)") {
    SourceClientRegistry.register("c1", new InMemorySourceClient(mkShards(4, 250)))
    try {
      val dir = tmpDir()
      val q = spark.readStream.format("graft-stream")
        .option("client", "c1").option("batchsize", "50").load()
        .writeStream.format("memory").queryName("drain")
        .option("checkpointLocation", dir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val rows = spark.sql("SELECT shardId, sequenceNumber FROM drain").collect()
      rows.length shouldBe 1000
      rows.map(r => (r.getString(0), r.getString(1))).distinct.length shouldBe 1000
      spark.sql("DROP TABLE drain")
    } finally SourceClientRegistry.unregister("c1")
  }

  test("explicitHashKey rides the envelope verbatim — set, absent, and schema (processor.rs:26, VERDICT r11 missing #3)") {
    // every even record carries a producer routing override; odd don't
    val shards = Map("shard-0" -> (0 until 10).map { i =>
      rec("shard-0", i).copy(
        explicitHashKey = if (i % 2 == 0) Some(s"ehk-$i") else None)
    })
    SourceClientRegistry.register("cehk", new InMemorySourceClient(shards))
    try {
      val dir = tmpDir()
      val q = spark.readStream.format("graft-stream")
        .option("client", "cehk").load()
        .writeStream.format("memory").queryName("ehk")
        .option("checkpointLocation", dir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val df = spark.sql("SELECT sequenceNumber, explicitHashKey FROM ehk")
      df.schema("explicitHashKey").dataType.typeName shouldBe "string"
      df.schema("explicitHashKey").nullable shouldBe true
      val got = df.collect()
        .map(r => r.getString(0).toInt -> Option(r.getString(1))).toMap
      got.size shouldBe 10
      (0 until 10).foreach { i =>
        got(i) shouldBe (if (i % 2 == 0) Some(s"ehk-$i") else None)
      }
      spark.sql("DROP TABLE ehk")
    } finally SourceClientRegistry.unregister("cehk")
  }

  test("admission cap: at most batchSize*maxLoops records per shard per micro-batch (S4)") {
    SourceClientRegistry.register("c2", new InMemorySourceClient(mkShards(2, 100)))
    try {
      val q = spark.readStream.format("graft-stream")
        .option("client", "c2").option("batchsize", "10")
        .option("maxbatchretrievalloops", "3").load()
        .writeStream.format("memory").queryName("capped")
        .option("checkpointLocation", tmpDir())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.sql("SELECT count(*) FROM capped").head().getLong(0) shouldBe 200
      // 100 records/shard at 30/shard/batch → ≥ 4 micro-batches
      q.recentProgress.count(_.numInputRows > 0) should be >= 4
      all(q.recentProgress.map(_.numInputRows)) should be <= 60L // 2 shards × 30
      spark.sql("DROP TABLE capped")
    } finally SourceClientRegistry.unregister("c2")
  }

  test("restart resumes from the offset log, not from scratch (O5/engine checkpoint)") {
    val dir = tmpDir()
    // memory sink can't recover from a checkpoint; foreachBatch can
    def runOnce(): Long = {
      val counter = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("graft-stream").option("client", "c3").load()
        .writeStream.option("checkpointLocation", dir)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
          counter.addAndGet(df.count()); ()
        })
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      counter.get()
    }
    SourceClientRegistry.register("c3", new InMemorySourceClient(mkShards(2, 100)))
    try {
      runOnce() shouldBe 200
      // stream grows: same key now serves 150/shard; restart on same offset log
      SourceClientRegistry.register("c3", new InMemorySourceClient(mkShards(2, 150)))
      runOnce() shouldBe 100 // only the 50×2 new records
    } finally SourceClientRegistry.unregister("c3")
  }

  test("initial position Latest starts at the end (initial_position_tests.rs:83)") {
    SourceClientRegistry.register("c4", new InMemorySourceClient(mkShards(2, 50)))
    try readAll("c4", Map("initialposition" -> "latest")) shouldBe 0
    finally SourceClientRegistry.unregister("c4")
  }

  test("initial position at_sequence starts mid-shard (initial_position_tests.rs:168)") {
    SourceClientRegistry.register("c5", new InMemorySourceClient(mkShards(1, 100)))
    try
      // AtSequenceNumber is inclusive (reference client.rs:117-134 maps it verbatim)
      readAll("c5", Map("initialposition" -> "at_sequence:0000000090")) shouldBe 10
    finally SourceClientRegistry.unregister("c5")
  }

  test("initial position at_timestamp starts at arrival time (initial_position_tests.rs:222)") {
    // records carry arrival timestamps 0..99 minutes
    val recs = (0 until 100).map { i =>
      KRecord(f"$i%010d", s"pk-$i", s"p-$i".getBytes("UTF-8"),
        Some(new java.sql.Timestamp(i * 60000L)), "shard-0")
    }
    SourceClientRegistry.register("c5t", new InMemorySourceClient(Map("shard-0" -> recs.toIndexedSeq)))
    try
      // start at minute 90 → 10 records remain
      readAll("c5t", Map("initialposition" -> s"at_timestamp:${90 * 60000L}")) shouldBe 10
    finally SourceClientRegistry.unregister("c5t")
  }

  test("at_sequence past end-of-shard positions at the end, not TrimHorizon (ADVICE r2)") {
    val client = new InMemorySourceClient(mkShards(1, 100))
    val it = client.getShardIterator("s", "shard-0",
      ShardIteratorType.AtSequenceNumber("9999999999"))
    client.getRecords(it, 10).records shouldBe empty
    // and through the stream: no replay of the whole shard
    SourceClientRegistry.register("c5e", client)
    try readAll("c5e", Map("initialposition" -> "at_sequence:9999999999")) shouldBe 0
    finally SourceClientRegistry.unregister("c5e")
  }

  test("parquet-backed arrival timestamps are epoch-correct; at_timestamp over them works (ADVICE r2)") {
    // ts in events.parquet is epoch-NANOS; a bad numeric cast lands ~year
    // 56000 and silently replays the whole shard on any AtTimestamp start.
    val client = EventStream.clientFromParquet(spark, "/root/testdata/sf0.001/events.parquet")
    val all = client.shards.values.flatten.toSeq
    val jan2024 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val feb2024 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
    all.foreach { r =>
      val t = r.approximateArrivalTimestamp.get.getTime
      t should (be >= jan2024 and be < feb2024)
    }
    // mid-January start must be a strict partial replay
    SourceClientRegistry.register("c5p", client)
    try {
      val mid = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
      val n = readAll("c5p", Map("initialposition" -> s"at_timestamp:$mid"))
      n should (be > 0L and be < all.length.toLong)
    } finally SourceClientRegistry.unregister("c5p")
  }

  test("stored checkpoint wins over initial position (O6, initial_position_tests.rs:264-388)") {
    val store = new InMemoryCheckpointStore
    store.saveCheckpoint("shard-0", "0000000079") // 80 consumed → 20 remain
    CheckpointStoreRegistry.register("s6", store)
    SourceClientRegistry.register("c6", new InMemorySourceClient(mkShards(1, 100)))
    try {
      readAll("c6", Map("checkpointstore" -> "s6")) shouldBe 20
      // preferStoredCheckpoint=false ignores the store (fresh TrimHorizon)
      readAll("c6", Map("checkpointstore" -> "s6", "preferstoredcheckpoint" -> "false")) shouldBe 100
    } finally { SourceClientRegistry.unregister("c6"); CheckpointStoreRegistry.unregister("s6") }
  }

  test("expired iterator renews from last consumed index, no loss no dupes (O7)") {
    val scripted = new ScriptedSourceClient(mkShards(1, 100))
    scripted.scriptGetRecordsError(SourceClientError.ExpiredIterator("boom"))
    val (_, queue) = EventSink.registered("o7-events")
    SourceClientRegistry.register("c7", scripted)
    try {
      readAll("c7", Map("batchsize" -> "10", "eventsink" -> "o7-events")) shouldBe 100
      val iterEvents = queue.drain().map(_.eventType).collect {
        case ProcessingEventType.Iterator(t, _) => t
      }
      iterEvents should contain(IteratorEventType.Expired)
      iterEvents should contain(IteratorEventType.Renewed)
    } finally { SourceClientRegistry.unregister("c7"); EventSink.unregister("o7-events") }
  }

  /** Expires the Nth getRecords call once — lets ladder tests trigger
    * expiry mid-partition, after real progress has been made. */
  private final class ExpireOnCall(shards: Map[String, IndexedSeq[KRecord]], failOn: Int)
      extends InMemorySourceClient(shards) {
    private val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    override def getRecords(iterator: String, limit: Int): GetRecordsResult =
      if (calls.incrementAndGet() == failOn) throw SourceClientError.ExpiredIterator("expired")
      else super.getRecords(iterator, limit)
  }

  private def ladderRead(clientKey: String, extra: Map[String, String]): (Long, Long) = {
    val reader = spark.readStream.format("graft-stream").option("client", clientKey)
      .option("batchsize", "10").option("expiryfallbackladder", "true")
    extra.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream.format("memory").queryName("ladder")
      .option("checkpointLocation", tmpDir())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val row = spark.sql(
      "SELECT count(*), count(DISTINCT sequenceNumber) FROM ladder").head()
    spark.sql("DROP TABLE IF EXISTS ladder")
    (row.getLong(0), row.getLong(1))
  }

  test("O7 ladder rung 1: expiry renews from stored checkpoint, replaying records behind it (at-least-once, processor.rs:870-994)") {
    // checkpoint at seq 19 (index 20); expiry fires on the 4th page (pos 30)
    // → renewal re-anchors at 20 and records 20..29 are re-delivered
    val store = new InMemoryCheckpointStore
    store.saveCheckpoint("shard-0", "0000000019")
    CheckpointStoreRegistry.register("lad1s", store)
    SourceClientRegistry.register("lad1", new ExpireOnCall(mkShards(1, 100), failOn = 4))
    try {
      val (total, distinct) = ladderRead("lad1",
        Map("checkpointstore" -> "lad1s", "preferstoredcheckpoint" -> "false"))
      distinct shouldBe 100 // no loss
      total shouldBe 110 // 30 before expiry + replay of 20..99
    } finally { SourceClientRegistry.unregister("lad1"); CheckpointStoreRegistry.unregister("lad1s") }
  }

  test("O7 ladder rung 2: no checkpoint store, expiry renews after the last-seen sequence (no dupes)") {
    SourceClientRegistry.register("lad2", new ExpireOnCall(mkShards(1, 100), failOn = 4))
    try {
      val (total, distinct) = ladderRead("lad2", Map.empty)
      distinct shouldBe 100
      total shouldBe 100 // AfterSequenceNumber(last seen) = exact resume
    } finally SourceClientRegistry.unregister("lad2")
  }

  test("O7 ladder rung 3: expiry before any record falls back to TrimHorizon (full delivery)") {
    SourceClientRegistry.register("lad3", new ExpireOnCall(mkShards(1, 100), failOn = 1))
    try {
      val (total, distinct) = ladderRead("lad3", Map.empty)
      distinct shouldBe 100
      total shouldBe 100
    } finally SourceClientRegistry.unregister("lad3")
  }

  test("resharding: newly listed shards are picked up between micro-batches (test_suite2.rs:53-114)") {
    val scripted = new ScriptedSourceClient(mkShards(3, 40))
    val twoShards = Seq(ShardInfo("shard-0"), ShardInfo("shard-1"))
    // parent-only listings for the first calls (initialOffset + first poll);
    // afterwards the default listing exposes the child shard-2
    (1 to 2).foreach(_ => scripted.scriptListShards(twoShards))
    SourceClientRegistry.register("c8", scripted)
    try {
      val q = spark.readStream.format("graft-stream")
        .option("client", "c8").option("batchsize", "10").load()
        .writeStream.format("memory").queryName("reshard")
        .option("checkpointLocation", tmpDir())
        .trigger(Trigger.ProcessingTime(0)).start()
      q.processAllAvailable()
      q.stop()
      val perShard = spark.sql("SELECT shardId, count(*) c FROM reshard GROUP BY shardId")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      perShard shouldBe Map("shard-0" -> 40L, "shard-1" -> 40L, "shard-2" -> 40L)
      spark.sql("DROP TABLE reshard")
    } finally SourceClientRegistry.unregister("c8")
  }

  test("throttle retry: backoff then success; fail-fast on access denied (R4, client.rs:195-229)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val scripted = new ScriptedSourceClient(mkShards(1, 10))
    scripted.scriptGetRecordsError(SourceClientError.Throttled("t1"))
    scripted.scriptGetRecordsError(SourceClientError.Throttled("t2"))
    val retrying = new ThrottleRetryingClient(scripted, maxRetries = 3, sleep = sleeps.append(_))
    val it = retrying.getShardIterator("s", "shard-0", ShardIteratorType.TrimHorizon)
    retrying.getRecords(it, 10).records.length shouldBe 10
    sleeps.toSeq shouldBe Seq(100L, 200L) // 100ms·2^(n-1) schedule
    scripted.scriptGetRecordsError(SourceClientError.AccessDenied("nope"))
    assertThrows[SourceClientError.AccessDenied](retrying.getRecords(it, 10))
    // throttle exhaustion after maxRetries
    (1 to 4).foreach(_ => scripted.scriptGetRecordsError(SourceClientError.Throttled("t")))
    assertThrows[SourceClientError.Throttled](retrying.getRecords(it, 10))
  }

  test("GraftOffset json round-trips arbitrary shard ids (property, VERDICT r4 #7)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // shard ids stressing the escaper: quotes, backslashes, colons, braces,
    // digits — anything printable a hand-rolled JSON codec could trip on
    val idChar = Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const('"')), (2, Gen.const('\\')),
      (1, Gen.oneOf(':', ',', '{', '}', '-', '_', ' ', '.')))
    val shardId = Gen.nonEmptyListOf(idChar).map(_.mkString)
    val positions = Gen.mapOf(Gen.zip(shardId, Gen.chooseNum(0L, Long.MaxValue)))
    val prop = Prop.forAll(positions) { m =>
      GraftOffset.fromJson(GraftOffset(m).json()) == GraftOffset(m)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    withClue(res.status.toString)(res.passed shouldBe true)
  }
}
