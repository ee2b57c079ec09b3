package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.{KRecord, RetryConfig, RetryingCheckpointStore, ShardIteratorType}
import graft.core.aws.{DynamoApi, DynamoCheckpointStore}
import graft.sources.aws._

/** The real-AWS adapter skeletons (VERDICT r11 #8) are compile-gated AND
  * behavior-gated here against fake transports: everything above the
  * two-method SDK seam — error-code → taxonomy mapping, ListShards
  * pagination, iterator-type translation, reflective per-JVM factory
  * construction, and composition with the spec-gated R4 throttle retry
  * and the reference-contract checkpoint retry decorator — is real,
  * tested engine code. A networked deployment adds only the SDK-backed
  * `KinesisApi`/`DynamoApi` classes.
  */
class AwsAdapterSpec extends AnyFunSuite with Matchers {

  private def client(extra: (String, String)*): KinesisSourceClient =
    new KinesisSourceClient(
      (Map("apiClass" -> classOf[FakeKinesisApi].getName) ++ extra).toMap)

  test("listShards follows nextToken pagination to the end") {
    FakeKinesisApi.reset()
    client().listShards("s").map(_.shardId) shouldBe
      Seq("shard-0", "shard-1", "shard-2", "shard-3", "shard-4")
    FakeKinesisApi.listCalls.get() shouldBe 3 // 2+2+1 across pages
  }

  test("iterator types translate to the five request shapes (client.rs:135-172)") {
    FakeKinesisApi.reset()
    val c = client()
    c.getShardIterator("s", "shard-0", ShardIteratorType.TrimHorizon) shouldBe
      "it:TRIM_HORIZON::"
    c.getShardIterator("s", "shard-0", ShardIteratorType.Latest) shouldBe
      "it:LATEST::"
    c.getShardIterator("s", "shard-0",
      ShardIteratorType.AtSequenceNumber("7")) shouldBe "it:AT_SEQUENCE_NUMBER:7:"
    c.getShardIterator("s", "shard-0",
      ShardIteratorType.AfterSequenceNumber("7")) shouldBe "it:AFTER_SEQUENCE_NUMBER:7:"
    c.getShardIterator("s", "shard-0",
      ShardIteratorType.AtTimestamp(java.time.Instant.ofEpochMilli(123L)))
      .shouldBe("it:AT_TIMESTAMP::123")
  }

  test("SDK error codes map onto the SourceClientError taxonomy (client.rs:174-232)") {
    FakeKinesisApi.reset()
    val c = client()
    def failWith(code: String) = {
      FakeKinesisApi.script(KinesisApiException(code, "x"))
      intercept[SourceClientError](c.getRecords("it", 10))
    }
    failWith("ProvisionedThroughputExceededException") shouldBe a[SourceClientError.Throttled]
    failWith("LimitExceededException") shouldBe a[SourceClientError.Throttled]
    failWith("ExpiredIteratorException") shouldBe a[SourceClientError.ExpiredIterator]
    failWith("AccessDeniedException") shouldBe a[SourceClientError.AccessDenied]
    failWith("KMSAccessDeniedException") shouldBe a[SourceClientError.AccessDenied]
    failWith("SomethingElse") shouldBe a[SourceClientError.Other]
  }

  test("factory builds reflectively and composes the R4 throttle retry") {
    FakeKinesisApi.reset()
    val built = new KinesisSourceClientFactory().build(
      Map("apiClass" -> classOf[FakeKinesisApi].getName, "maxRetries" -> "3"))
    // two throttles then data: R4 absorbs both, the caller sees records
    FakeKinesisApi.script(
      KinesisApiException("ProvisionedThroughputExceededException", "t1"))
    FakeKinesisApi.script(
      KinesisApiException("ProvisionedThroughputExceededException", "t2"))
    val r = built.getRecords("it", 10)
    r.records.map(_.sequenceNumber) shouldBe Seq("1", "2")
    r.nextIterator shouldBe None // end of shard propagates
    // expiry is fail-fast THROUGH the retry wrapper (O7 owns renewal)
    FakeKinesisApi.script(KinesisApiException("ExpiredIteratorException", "e"))
    intercept[SourceClientError.ExpiredIterator](built.getRecords("it", 10))
  }

  test("a missing apiClass fails loudly at construction, not at first call") {
    val e = intercept[UnsupportedOperationException](
      new KinesisSourceClient(Map.empty))
    e.getMessage should include("apiClass")
  }

  test("DynamoCheckpointStore: LWW item per shard through the seam; reference retry contract composes") {
    FakeDynamoApi.reset()
    val store = new DynamoCheckpointStore("ckpt-table",
      Map("apiClass" -> classOf[FakeDynamoApi].getName))
    store.getCheckpoint("shard-0") shouldBe None
    store.saveCheckpoint("shard-0", "100")
    store.saveCheckpoint("shard-0", "200") // last writer wins, no condition
    store.getCheckpoint("shard-0") shouldBe Some("200")
    FakeDynamoApi.items.get("ckpt-table/shard-0") shouldBe "200"
    // the production wiring: the reference's bounded-warn retry contract
    // lives in the decorator, not the adapter
    FakeDynamoApi.failNextPuts.set(2)
    val retrying = new RetryingCheckpointStore(store,
      RetryConfig(maxRetries = Some(5), backoff = graft.core.FixedBackoff(1L)))
    retrying.saveCheckpoint("shard-0", "300")
    store.getCheckpoint("shard-0") shouldBe Some("300")
  }
}

/** Reflectively-constructed fake transport: 5 shards over 3 ListShards
  * pages; iterators encode their request shape; getRecords serves one
  * 2-record page then end-of-shard, consuming scripted errors first. */
final class FakeKinesisApi extends KinesisApi {
  import FakeKinesisApi._
  override def listShards(streamName: String, nextToken: Option[String]) = {
    listCalls.incrementAndGet()
    nextToken match {
      case None => (Seq("shard-0", "shard-1"), Some("p2"))
      case Some("p2") => (Seq("shard-2", "shard-3"), Some("p3"))
      case Some(_) => (Seq("shard-4"), None)
    }
  }
  override def getShardIterator(streamName: String, shardId: String,
      iteratorType: String, sequenceNumber: Option[String],
      timestampMillis: Option[Long]): String =
    s"it:$iteratorType:${sequenceNumber.getOrElse("")}:${timestampMillis.fold("")(_.toString)}"
  override def getRecords(iterator: String, limit: Int) = {
    Option(scripted.poll()).foreach(throw _)
    (Seq(
      KRecord("1", "pk", "a".getBytes("UTF-8"), None, "shard-0"),
      KRecord("2", "pk", "b".getBytes("UTF-8"), None, "shard-0",
        explicitHashKey = Some("ehk"))), None)
  }
}
object FakeKinesisApi {
  val listCalls = new AtomicInteger(0)
  val scripted = new ConcurrentLinkedQueue[KinesisApiException]()
  def script(e: KinesisApiException): Unit = { scripted.add(e); () }
  def reset(): Unit = { listCalls.set(0); scripted.clear() }
}

/** Reflectively-constructed fake Dynamo transport with scripted put
  * failures (for the retry-decorator composition check). */
final class FakeDynamoApi extends DynamoApi {
  import FakeDynamoApi._
  override def getItem(table: String, shardId: String): Option[String] =
    Option(items.get(s"$table/$shardId"))
  override def putItem(table: String, shardId: String, seq: String): Unit = {
    if (failNextPuts.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("transient dynamo failure")
    items.put(s"$table/$shardId", seq); ()
  }
}
object FakeDynamoApi {
  val items = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val failNextPuts = new AtomicInteger(0)
  def reset(): Unit = { items.clear(); failNextPuts.set(0) }
}
