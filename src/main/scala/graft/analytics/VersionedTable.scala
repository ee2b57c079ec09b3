package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured VERSIONED table over parquet: append-only delta
  * directories plus an as-of read — the dataset-versioning layer a
  * training pipeline needs for REPRODUCIBLE SNAPSHOTS ("train on the
  * corpus exactly as it stood at version k"), the capability Delta/
  * Iceberg call time travel. [[KeyedMerge]] is the complementary
  * in-place MERGE (current state only, buckets rewritten); this table
  * never rewrites — history IS the layout:
  *
  *   - version k's changes land at `dir/delta=<k>/` via an
  *     error-if-exists write: delta directories are IMMUTABLE once
  *     written, so a re-run of a committed version fails loudly instead
  *     of silently forking history;
  *   - [[readAsOf]](k) reads the table with `delta` as a partition
  *     column and filters `delta <= k` — PARTITION PRUNING, so a
  *     snapshot read scans exactly the files that existed at version k
  *     and later deltas are never opened;
  *   - current state per key is last-writer-wins: the same struct-argmax
  *     aggregation as [[KeyedMerge]] (seq columns lead the struct; a
  *     winning `__op = 'd'` tombstone deletes the key from the
  *     snapshot).
  *
  * 100 TB shape: an as-of read is one pruned scan + one key-partitioned
  * partial+final aggregation — no window sort, no driver materialization,
  * and no rewrite amplification ever (appends only). The trade against
  * KeyedMerge is read-side merge cost growing with delta count; the
  * maintenance move is f7-style compaction of deltas `0..k` into a new
  * base version, which this layout expresses as just another delta.
  */
object VersionedTable {

  /** 'u' = upsert, 'd' = delete; required on every delta batch. */
  val OpCol: String = KeyedMerge.OpCol

  /** Commit `batch` as version `k`. Immutable: fails if `k` exists. */
  def appendDelta(dir: String, batch: DataFrame, k: Long): Unit = {
    require(!batch.columns.contains("delta"), "'delta' is reserved")
    batch.write.mode("errorifexists").parquet(s"$dir/delta=$k")
  }

  /** Idempotent commit of `batch` as version `k` — the foreachBatch sink
    * form, safe under at-least-once epoch replay AND a crash mid-write
    * (ADVICE r11: a bare `exists(delta=k)` guard treats a PARTIALLY
    * written delta as committed — the parquet committer creates the
    * target dir at job setup, so a crash mid-job leaves `delta=k`
    * existing with no data and the replayed epoch silently skips it:
    * permanent data loss). Protocol:
    *
    *   1. committed ⇔ `delta=k/_SUCCESS` exists (the committer's job
    *      marker travels with the directory) — a replayed epoch skips;
    *   2. a dir without the marker is a crash remnant — deleted;
    *   3. the write lands in a dot-prefixed temp dir (hidden from
    *      [[readAsOf]]'s partition discovery) and PUBLISHES via one
    *      atomic rename, so `delta=k` is only ever absent or complete.
    *
    * If `_SUCCESS` emission is disabled (`mapreduce.fileoutputcommitter
    * .marksuccessfuljobs=false`) the skip optimization degrades to
    * delete+rewrite of a deterministic batch — still exactly-once in
    * effect, never lossy. */
  def commitDelta(dir: String, batch: DataFrame, k: Long): Unit = {
    require(!batch.columns.contains("delta"), "'delta' is reserved")
    val hc = batch.sparkSession.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(s"$dir/delta=$k")
    val fs = target.getFileSystem(hc)
    val marker = new org.apache.hadoop.fs.Path(target, "_SUCCESS")
    if (fs.exists(marker)) return // committed — replayed epoch, no-op
    if (fs.exists(target)) fs.delete(target, true) // partial: discard
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.tmp_delta_$k")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    batch.write.mode("errorifexists").parquet(tmp.toString)
    if (!fs.rename(tmp, target)) {
      // lost a publish race: a concurrent committer must have won
      fs.delete(tmp, true)
      require(fs.exists(target),
        s"delta=$k publish failed with no committed winner present")
    }
  }

  /** The table exactly as it stood after version `asOf` committed:
    * last-writer-wins over deltas 0..asOf, tombstones applied. */
  def readAsOf(s: SparkSession, dir: String, keyCols: Seq[String],
      seqCols: Seq[String], asOf: Long): DataFrame = {
    val all = s.read.parquet(dir).filter(col("delta") <= asOf)
    val dataCols = all.columns.toSeq.filterNot(_ == "delta")
    val ordered = (seqCols.filterNot(keyCols.contains) ++
      dataCols.filterNot(c => keyCols.contains(c) || seqCols.contains(c)))
      .distinct
    all.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__w"))
      .select(keyCols.map(col) ++ ordered.map(c => col(s"__w.$c")): _*)
      .filter(col(OpCol) =!= "d")
      .drop(OpCol)
  }
}
