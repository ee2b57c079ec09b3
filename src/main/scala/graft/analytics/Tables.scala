package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in this engine takes `(SparkSession, sfDir)` and reads through
  * here, so scans stay declarative `spark.read.parquet` — Catalyst gets
  * predicate pushdown, column pruning and partition listing for free, which is
  * the behavior that must survive a 100 TB scale-up (SURVEY §4).
  */
object Tables {
  // Each spark.read.parquet call pays a footer-read schema-inference job;
  // the registered queries read the same handful of tables hundreds of
  // times per session, so the (session, path) → DataFrame plan is memoized
  // (a DataFrame is just a logical plan — reuse within a session is free).
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // evict plans from stopped sessions so the map stays bounded
    cache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    cache.getOrElseUpdate((spark, path), spark.read.parquet(path))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
