package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout write path: the storage-side half of the 100 TB join
  * strategy. Writing a fact table bucketed (and sorted) by its join key
  * lets every later equi-join or aggregation on that key skip the shuffle
  * entirely — Spark's scan reports the bucketing as its output
  * partitioning, so Catalyst plans a SortMergeJoin with NO Exchange on
  * either pre-bucketed side, and `=` filters on the bucket key prune to a
  * single bucket's files (SelectedBucketsCount in the scan).
  *
  * At 100 TB this converts the dominant repeated cost (re-shuffling the
  * same fact table for every query in a workload) into a one-time layout
  * cost at ingest. The bucket count is the write-time knob: it bounds both
  * read parallelism and per-bucket file size, so size it to the cluster
  * (e.g. 4–16k buckets for a 1000-executor fleet), not to the laptop.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered in the session catalog. `saveAsTable` is required —
    * bucketing metadata lives in the catalog, not in the files. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      key: String,
      sortKeys: Seq[String] = Nil): Unit = {
    val sorted = if (sortKeys.isEmpty) Seq(key) else sortKeys
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucketing metadata flows from the
    * catalog into the scan's output partitioning). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
