package graft.analytics


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format coverage beyond parquet: JSONL and CSV ingestion, the two
  * text formats every training-data pipeline receives upstream data in.
  *
  * Each query round-trips the `documents` table through the format (write
  * from parquet → read back) and aggregates the RE-READ copy; the oracle
  * aggregates the ORIGINAL parquet, so any loss in the writer/reader pair —
  * quoting, escaping, schema drift, type coercion — breaks the hash. Reads
  * use an EXPLICIT schema: at 100 TB, schema inference over JSON/CSV is a
  * full extra pass over the data and is never acceptable; pinning
  * `.schema(...)` here is the discipline, not a convenience.
  *
  * Scale shape: both formats split by line, so reads parallelize per file
  * chunk exactly like parquet scans (minus column pruning/pushdown — the
  * reason the engine's resident format stays parquet; these paths are for
  * INGEST).
  */
object FormatQueries {

  import Tables._

  private def roundtripAgg(df: DataFrame): DataFrame =
    df.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"), col("source"))

  private val roundtripOracle: String =
    """SELECT lang, source, count(*) AS n_docs,
      |CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  /** f1 — JSONL (newline-delimited JSON) source path. */
  def f1JsonlSource(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-jsonl")
    val docs = documents(s, d)
    docs.write.mode("overwrite").json(tmp)
    roundtripAgg(s.read.schema(docs.schema).json(tmp))
  }

  /** f2 — CSV source path (header + quoting exercised by the text column). */
  def f2CsvSource(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-csv")
    val docs = documents(s, d)
    docs.write.mode("overwrite").option("header", "true").csv(tmp)
    roundtripAgg(s.read.schema(docs.schema).option("header", "true").csv(tmp))
  }

  /** f3 — ORC source/sink path. Unlike the line formats above, ORC is a
    * real RESIDENT-format alternative: columnar, with column pruning and
    * predicate pushdown intact (FormatSpec pins both on the re-read scan),
    * so a deployment landing ORC from upstream can query it in place
    * rather than converting. */
  def f3OrcSource(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-orc")
    val docs = documents(s, d)
    docs.write.mode("overwrite").orc(tmp)
    roundtripAgg(s.read.schema(docs.schema).orc(tmp))
  }

  /** f4 — HIVE-PARTITIONED layout: write the corpus `partitionBy(lang)`
    * (one directory per language — the standard 100 TB lake layout for a
    * multilingual corpus), then aggregate a single partition of the
    * re-read. The re-read scan must prune to the `lang=en` directory via
    * PARTITION FILTERS — zero bytes of any other language touched
    * (FormatSpec pins `PartitionFilters` on the scan). The oracle
    * aggregates the original table under the same predicate, so a row
    * landing in the wrong partition directory breaks the hash.
    *
    * Partition count discipline: partition columns must be LOW
    * cardinality (languages, dates, sources — not ids); each partition
    * dir × file adds namenode/listing load, the documented knob. */
  def f4PartitionedSource(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-part")
    val docs = documents(s, d)
    docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
    roundtripAgg(s.read.parquet(tmp).filter(col("lang") === "en"))
  }

  val f4Oracle: String =
    """SELECT lang, source, count(*) AS n_docs,
      |CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents WHERE lang = 'en' GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  /** f5 — SCHEMA EVOLUTION across parquet vintages: a 100 TB lake is never
    * one schema — columns get added (here `quality`) and early batches
    * lack columns later ones carry (`source`). Write the corpus twice
    * (v1: pre-`source`/pre-`quality` vintage; v2: full schema + the new
    * `quality` column), read BOTH with `mergeSchema=true`, and aggregate
    * the union — absent columns must surface as NULLs, never as read
    * errors or silent drops. The oracle rebuilds the two vintages as a
    * UNION ALL with explicit NULL columns, so a row coerced or lost in
    * the merge breaks the hash.
    *
    * Scale discipline: `mergeSchema` is a FOOTER-ONLY pass (per-file
    * metadata union, no data read) but it is O(files) on the namenode —
    * at lake scale you pin the merged schema in a table catalog and pass
    * `.schema(...)` instead; this path exercises the semantics the
    * catalog entry must encode. */
  def f5SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-evo")
    val docs = documents(s, d)
    docs.select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/v1")
    docs.withColumn("quality", pmod(col("n_chars"), lit(7L)))
      .write.mode("overwrite").parquet(s"$tmp/v2")
    s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_v1_rows"),
        sum(coalesce(col("quality"), lit(0L))).as("sum_quality"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  val f5Oracle: String =
    """WITH m AS (
      |  SELECT lang, n_chars, NULL AS source, NULL AS quality FROM documents
      |  UNION ALL
      |  SELECT lang, n_chars, source, n_chars % 7 AS quality FROM documents)
      |SELECT lang, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1_rows,
      |  CAST(sum(coalesce(quality, 0)) AS BIGINT) AS sum_quality,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  /** f6 — SORT-CLUSTERED LAYOUT + DATA SKIPPING: rewrite the fact table
    * range-partitioned AND sorted by `l_shipdate`, then answer a
    * date-range aggregate off the re-read. Clustering is THE passive
    * 100 TB read lever: with values clustered, parquet row-group min/max
    * stats become tight, so a pushed range predicate skips whole row
    * groups/files instead of decoding and discarding — the same scan on
    * an unclustered layout reads everything. FormatSpec pins that the
    * range predicate is pushed to the re-read scan; the oracle pins that
    * the rewrite lost/duplicated nothing under the same predicate.
    *
    * `repartitionByRange` is the write-side shape: one range-exchange at
    * write time buys every later reader the pruning — the batch analog of
    * an index, amortized across all future scans. Low-cardinality daily
    * partitions (f4) + in-file sort (f6) compose: dir pruning first, then
    * row-group skipping within the day. */
  def f6ClusteredLayout(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-clust")
    // range-partition count follows the rig (one write task per core),
    // never a pinned constant that caps parallelism as SF grows
    lineitem(s, d)
      .repartitionByRange(s.sparkContext.defaultParallelism, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"))
      .orderBy(col("l_returnflag"))
  }

  val f6Oracle: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** f7 — SMALL-FILE COMPACTION: the lake-maintenance op every 100 TB
    * deployment runs continuously — streaming ingest and over-parallel
    * writes leave directories of kilobyte files whose per-file open/
    * footer/metadata cost dominates scans and floods the driver's file
    * index. The op: measure the directory's actual bytes, size the
    * output at ⌈bytes / target⌉ files
    * (`spark.graft.compaction.targetBytes`, default 128 MB — the
    * maxPartitionBytes-aligned sweet spot), and rewrite through
    * `coalesce` — NO shuffle: compaction merges input splits; a shuffle
    * would pay the full network cost of the data for a layout-only fix
    * (contrast f6, where the range exchange buys ordering; here nothing
    * needs reordering). FormatCompactionSpec pins the file count and the
    * no-exchange plan; the oracle pins that the rewrite lost/duplicated
    * nothing.
    *
    * Fragmentation source here: a 64-way over-parallel write of the
    * documents corpus (the ingest-tail shape). */
  def f7Compaction(s: SparkSession, d: String): DataFrame = {
    val tmp = Scratch.dir("graft-compact")
    val small = s"$tmp/small"
    val out = s"$tmp/compacted"
    documents(s, d).repartition(64).write.mode("overwrite").parquet(small)
    roundtripAgg(s.read.parquet(compactParquet(s, small, out)))
  }

  /** The reusable compaction kernel: returns `out` after rewriting `dir`
    * into ⌈bytes/target⌉ files without a shuffle. */
  private[analytics] def compactParquet(s: SparkSession, dir: String,
      out: String): String = {
    val target = s.conf.getOption("spark.graft.compaction.targetBytes")
      .map(_.toLong).getOrElse(128L << 20)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val srcBytes = fs.listStatus(p)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val nOut = math.max(1L, (srcBytes + target - 1) / target).toInt
    s.read.parquet(dir).coalesce(nOut).write.mode("overwrite").parquet(out)
    out
  }

  /** f8 — KEYED MERGE (apply-changes / SCD1) under the oracle gate: the
    * events table is treated as a CDC stream over per-user state — every
    * event upserts the user's current (last_type, last_value); an 'error'
    * event is a tombstone deleting the account. The stream is applied as
    * 6 event-time-ordered change batches through [[KeyedMerge]] (bucketed
    * base, touched-bucket-only rewrite, struct-argmax last-writer-wins),
    * and the FINAL TABLE STATE is the query output. The DuckDB oracle
    * replays the same last-writer-wins rule in one window — equality
    * proves the incremental merge path converges to the batch answer:
    * one resurrected delete, one lost upsert, or one stale bucket breaks
    * the hash.
    *
    * Scale shape: each apply reads only the buckets its batch touches
    * (partition-pruned), aggregates per key (map-side partials), and
    * dynamically overwrites exactly those buckets; bucket count
    * self-scales from the corpus row count. */
  def f8KeyedMerge(s: SparkSession, d: String): DataFrame = {
    val dir = s"${Scratch.dir("graft-merge")}/table"
    val log = stagedCdcLogDir(s, d)
    val numBuckets = math.max(8L,
      math.min(4096L, cdcLogRowCount(s, log) / 50000L)).toInt
    (0 until CdcBatches).foreach { i =>
      // partition-pruned: exactly the staged delta=i files are opened
      val b = s.read.parquet(s"$log/log")
        .filter(col("delta") === i).drop("delta")
      KeyedMerge.applyChanges(s, dir, b,
        keyCols = Seq("user_id"), seqCols = Seq("tsu", "event_id"), numBuckets)
    }
    KeyedMerge.read(s, dir)
      .select(col("user_id"), col("last_type"), col("last_value"))
      .orderBy(col("user_id"))
  }

  private[analytics] val f8Oracle: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
      |    event_type, value FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY tsu DESC, event_id DESC) AS rn FROM c)
      |SELECT user_id, event_type AS last_type, value AS last_value
      |FROM r WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** f9 — VERSIONED SNAPSHOT READ (time travel) under the oracle gate:
    * f8's event CDC stream is committed as 6 event-time-ordered
    * APPEND-ONLY deltas through [[VersionedTable]], then the table is
    * read AS OF version 3 (mid-history) and version 5 (current) — the
    * reproducible-training-snapshot capability ("train on the corpus
    * exactly as it stood at version k"). The DuckDB oracle re-derives
    * the batch cutoffs from the same exact integer rule (lo/hi/span)
    * and replays last-writer-wins per (version, user). Equality proves
    * BOTH directions: the as-of-3 snapshot contains everything
    * committed through version 3, and nothing from versions 4-5 leaks
    * in (one leaked upsert, one missed tombstone, or one wrong cutoff
    * breaks the hash).
    *
    * Scale shape: each as-of read is one delta-pruned scan (`delta` is
    * a partition column, so versions > k are never opened) + one
    * key-partitioned partial+final argmax; appends never rewrite. */
  def f9SnapshotRead(s: SparkSession, d: String): DataFrame =
    versionedAsOf3And5(s, d, compactFirst = false)

  /** f10 — LOG COMPACTION under the oracle gate: f9's 6-delta build,
    * then [[VersionedTable.compactUpTo]] folds deltas 0..3 into one
    * base delta BEFORE the reads — and the output must still hash-equal
    * f9's oracle verbatim. That pins the whole maintenance contract at
    * once: the compacted base replays the as-of-3 snapshot bit-for-bit
    * (nothing lost, nothing from versions 4-5 leaked in), tombstones
    * survive compaction with their sequence numbers (a post-compaction
    * delta carrying an OLDER sequence must still lose), and the as-of-5
    * read over base+tail equals the uncompacted log's.
    *
    * Scale shape: compaction is one delta-pruned scan + one
    * key-partitioned partial+final argmax + one partitioned write (the
    * cost of a single as-of read plus the write); afterwards every
    * as-of read opens a BOUNDED file set instead of one directory per
    * historical micro-batch — the read-amplification counter-move a
    * long-running s22 ingest needs (soak-gated at 200 deltas in
    * SinkSoakSpec). */
  def f10LogCompaction(s: SparkSession, d: String): DataFrame =
    versionedAsOf3And5(s, d, compactFirst = true)

  /** Number of event-time batches the CDC fixture splits into — shared
    * by the staged build, every consumer, and the oracles' cutoff rule. */
  private val CdcBatches = 6

  /** Shared f8/f9/f10/f12 CDC SOURCE STAGE (r14, guide §2.4/§8): the
    * event CDC projection split into [[CdcBatches]] event-time batches
    * and laid out as a [[VersionedTable]]-shaped `delta=<k>` partitioned
    * log, built ONCE per (JVM, dataset) in ONE corpus pass. Before this,
    * each of the four entries re-derived the same batches from the raw
    * events table per invocation — a min/max pass plus one full corpus
    * scan PER BATCH (7 passes each, ~27 per sweep across the family).
    * The batch-index rule `min(5, (tsu - lo) div span)` assigns exactly
    * the rows the old per-batch range filters selected (the clamp is the
    * last batch's `< hi` upper bound; RoundThirteenOpsSpec's independent
    * hand replay uses the same rule), so every consumer's output — and
    * oracle hash — is unchanged.
    *
    * Staging discipline: the log is events-sized, but the UNSTAGED form
    * already wrote the same bytes to scratch per invocation — staging
    * strictly reduces both I/O (one build instead of three) and peak
    * disk (one shared copy + f10's mutable copy instead of three live
    * copies). Consumers that only READ ([[f9SnapshotRead]],
    * [[f12SnapshotDiff]], f8's batch source) use the stage directly;
    * [[f10LogCompaction]] MUTATES the log (compaction retires deltas),
    * so it file-copies the stage into scratch first ([[copyDirTree]] —
    * a byte copy, far cheaper than re-deriving from parquet). `meta`
    * carries the corpus row count so f8's bucket self-scaling needs no
    * extra corpus pass. */
  private[analytics] def stagedCdcLogDir(s: SparkSession, d: String): String =
    StageCache.getOrBuildDir(s"cdclog:$d") { dir =>
      val ch = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("tsu"), col("event_id"),
        when(col("event_type") === "error", lit("d")).otherwise(lit("u"))
          .as(VersionedTable.OpCol),
        col("event_type").as("last_type"), col("value").as("last_value"))
      val mm = ch.agg(min(col("tsu")), max(col("tsu")), count(lit(1))).head()
      val lo = mm.getLong(0); val hi = mm.getLong(1) + 1; val n = mm.getLong(2)
      val span = math.max(1L, (hi - lo + CdcBatches - 1) / CdcBatches)
      ch.withColumn("delta",
          least(lit(CdcBatches - 1L), expr(s"(tsu - ${lo}L) div ${span}L")))
        .write.partitionBy("delta").parquet(s"$dir/log")
      import s.implicits._
      Seq(n).toDF("n_rows").write.parquet(s"$dir/meta")
    }

  /** The staged corpus row count (f8's bucket sizing) — a 1-row read. */
  private def cdcLogRowCount(s: SparkSession, logDir: String): Long =
    s.read.parquet(s"$logDir/meta").head().getLong(0)

  /** Recursive file-tree copy (local FS) — f10's mutable log copy. */
  private def copyDirTree(src: String, dst: String): Unit = {
    val from = java.nio.file.Paths.get(src)
    val to = java.nio.file.Paths.get(dst)
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(from)
    try walk.iterator().asScala.foreach { p =>
      val t = to.resolve(from.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else { java.nio.file.Files.copy(p, t); () }
      ()
    } finally walk.close()
  }

  /** The versioned 6-delta log for f9/f10/f12: the shared stage when the
    * consumer only reads; a scratch copy when it will mutate. */
  private def versionedLogFor(s: SparkSession, d: String,
      mutable: Boolean): String = {
    val staged = s"${stagedCdcLogDir(s, d)}/log"
    if (!mutable) staged
    else {
      val dir = s"${Scratch.dir("graft-versioned")}/table"
      copyDirTree(staged, dir)
      dir
    }
  }

  /** Shared f9/f10 body: read the staged 6-delta log (a mutable copy
    * when compacting), optionally compact 0..3, read as-of 3 and 5. */
  private def versionedAsOf3And5(s: SparkSession, d: String,
      compactFirst: Boolean): DataFrame = {
    val dir = versionedLogFor(s, d, mutable = compactFirst)
    if (compactFirst)
      VersionedTable.compactUpTo(s, dir, 3L,
        Seq("user_id"), Seq("tsu", "event_id"))
    def asOf(k: Long) = VersionedTable
      .readAsOf(s, dir, Seq("user_id"), Seq("tsu", "event_id"), k)
      .withColumn("version", lit(k))
    asOf(3L).unionByName(asOf(5L))
      .select(col("version"), col("user_id"), col("last_type"),
        col("last_value"))
      .orderBy(col("version"), col("user_id"))
  }

  /** f12 — SNAPSHOT DIFF (change data feed): "what changed between
    * version 3 and version 5" over f9's versioned log — per key, the
    * `added` / `deleted` / `updated` classification with the old and
    * new visible values, the Delta-CDF / Iceberg-changelog capability
    * an incremental training pipeline consumes ("retrain on what
    * changed", audit a refresh, invalidate downstream caches by key).
    * `updated` means the VISIBLE row differs — a re-upsert carrying an
    * identical (type, value) pair is a non-change and must NOT appear;
    * a key tombstoned before v3 and re-inserted by v5 is `added`; one
    * absent at BOTH versions (inserted and deleted inside the window,
    * or tombstoned at both) emits nothing.
    *
    * Scale shape — the trick is ONE scan and ZERO joins: both LWW
    * winners come out of a single key-partitioned partial+final
    * aggregate via conditional struct-argmax (`max(when(delta <= 3,
    * struct(...)))` next to `max(struct(...))`), so the diff costs
    * exactly one as-of read — not two reads plus a full-outer join on
    * the key (the naive CDF formulation, which pays a second corpus
    * scan AND a second shuffle). The delta filter still prunes
    * partitions (`delta` is a partition column); the classification
    * and sentinel projection run on |keys| aggregated rows. The oracle
    * IS the naive two-snapshot full-outer-join form in DuckDB — the
    * independent derivation the one-scan plan must match. */
  def f12SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val dir = versionedLogFor(s, d, mutable = false)
    val op = VersionedTable.OpCol
    val fields = Seq(col("tsu"), col("event_id"), col(op),
      col("last_type"), col("last_value"))
    val w = s.read.parquet(dir).filter(col("delta") <= 5)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("delta") <= 3, struct(fields: _*))).as("w3"),
        max(struct(fields: _*)).as("w5"))
    val p3 = col("w3").isNotNull && col(s"w3.$op") === "u"
    val p5 = col(s"w5.$op") === "u" // w5 is never null: every key has rows
    val visDiff = col("w3.last_type") =!= col("w5.last_type") ||
      col("w3.last_value") =!= col("w5.last_value")
    w.select(
        when(!p3 && p5, lit("added"))
          .when(p3 && !p5, lit("deleted"))
          .when(p3 && p5 && visDiff, lit("updated")).as("change"),
        col("user_id"),
        when(p3, col("w3.last_type")).otherwise(lit("")).as("old_type"),
        when(p3, col("w3.last_value")).otherwise(lit(0.0)).as("old_value"),
        when(p5, col("w5.last_type")).otherwise(lit("")).as("new_type"),
        when(p5, col("w5.last_value")).otherwise(lit(0.0)).as("new_value"))
      .filter(col("change").isNotNull)
      .orderBy(col("change"), col("user_id"))
  }

  /** f12 oracle — the INDEPENDENT naive form: two LWW snapshots (the
    * f9 cutoff rule verbatim) full-outer-joined on the key. */
  private[analytics] val f12Oracle: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
      |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
      |    event_type AS last_type, value AS last_value FROM events),
      |prm AS (SELECT min(tsu) AS lo, max(tsu) + 1 AS hi,
      |    greatest(1, (max(tsu) + 1 - min(tsu) + 5) // 6) AS span FROM c),
      |r3 AS (SELECT user_id, op, last_type, last_value FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY c.user_id
      |      ORDER BY c.tsu DESC, c.event_id DESC) AS rn
      |    FROM c, prm p WHERE c.tsu < p.lo + 4 * p.span) t WHERE rn = 1),
      |r5 AS (SELECT user_id, op, last_type, last_value FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY c.user_id
      |      ORDER BY c.tsu DESC, c.event_id DESC) AS rn FROM c) t
      |  WHERE rn = 1),
      |j AS (SELECT coalesce(a.user_id, b.user_id) AS user_id,
      |    coalesce(a.op = 'u', FALSE) AS p3,
      |    coalesce(b.op = 'u', FALSE) AS p5,
      |    a.last_type AS ot, a.last_value AS ov,
      |    b.last_type AS nt, b.last_value AS nv
      |  FROM r3 a FULL JOIN r5 b ON a.user_id = b.user_id),
      |d AS (SELECT user_id,
      |    CASE WHEN NOT p3 AND p5 THEN 'added'
      |         WHEN p3 AND NOT p5 THEN 'deleted'
      |         WHEN p3 AND p5 AND (ot <> nt OR ov <> nv) THEN 'updated'
      |    END AS change,
      |    CASE WHEN p3 THEN ot ELSE '' END AS old_type,
      |    CASE WHEN p3 THEN ov ELSE 0.0 END AS old_value,
      |    CASE WHEN p5 THEN nt ELSE '' END AS new_type,
      |    CASE WHEN p5 THEN nv ELSE 0.0 END AS new_value
      |  FROM j)
      |SELECT change, user_id, old_type, old_value, new_type, new_value
      |FROM d WHERE change IS NOT NULL ORDER BY change, user_id""".stripMargin

  private[analytics] val f9Oracle: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
      |    event_type, value FROM events),
      |prm AS (SELECT min(tsu) AS lo, max(tsu) + 1 AS hi,
      |    greatest(1, (max(tsu) + 1 - min(tsu) + 5) // 6) AS span FROM c),
      |v AS (SELECT CAST(3 AS BIGINT) AS version
      |      UNION ALL SELECT CAST(5 AS BIGINT)),
      |cut AS (SELECT v.version,
      |    CASE WHEN v.version >= 5 THEN p.hi
      |         ELSE p.lo + (v.version + 1) * p.span END AS cutoff
      |  FROM v, prm p),
      |r AS (SELECT cut.version, c.*,
      |    row_number() OVER (PARTITION BY cut.version, c.user_id
      |      ORDER BY c.tsu DESC, c.event_id DESC) AS rn
      |  FROM c JOIN cut ON c.tsu < cut.cutoff)
      |SELECT version, user_id, event_type AS last_type, value AS last_value
      |FROM r WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY version, user_id""".stripMargin

  private val f11Ctr = new java.util.concurrent.atomic.AtomicLong()

  /** f11 — CATALOG-BUCKETED TABLE + ZERO-SHUFFLE CO-LOCATED JOIN: the
    * canonical Spark answer to "this join is the recurring cost of the
    * warehouse" — write the fact table ONCE with `bucketBy(user_id)` +
    * in-bucket sort, and every downstream aggregation and self-join on
    * that key runs with ZERO hash exchanges forever: the bucketed scan
    * satisfies the hash-clustered distribution that groupBy and
    * sort-merge join require, so the shuffle is paid at WRITE time, once,
    * instead of per query. (KeyedMerge/f8 builds the same layout by hand
    * for its own commit protocol; f11 exercises Spark's CATALOG bucketing
    * — the form plain `spark.table` consumers get.) The query writes the
    * events CDC slice bucketed 32 ways, then computes per-user totals and
    * purchase counts as two aggregations joined back on user_id — the
    * plan gate (FormatSpec) pins ZERO `Exchange hashpartitioning`
    * operators anywhere in it.
    *
    * Scale shape: at 100 TB the bucketed write is the one-time layout
    * job; 32 here self-documents the knob (buckets ≈ cluster cores ×
    * small multiple; the gate-side count must stay fixed so plans are
    * deterministic). Per-invocation unique table names (the Views
    * discipline) keep concurrent runs collision-free; the scratch path
    * keeps the catalog entry's data under the sweeper. The `merge` hint
    * pins the sort-merge form so the gate proves the BUCKETED join, not
    * a broadcast that would also pass. */
  def f11BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val base = Scratch.dir("graft_f11_")
    val tbl = s"graft_f11_t_${f11Ctr.incrementAndGet()}_${System.nanoTime()}"
    events(s, d).select(col("user_id"), col("event_type"))
      .write.format("parquet")
      .bucketBy(32, "user_id").sortBy("user_id")
      .option("path", s"$base/t")
      .saveAsTable(tbl)
    val t = s.table(tbl)
    val totals = t.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val purchases = t.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
    totals.hint("merge").join(purchases, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy(col("user_id"))
  }

  val f11Oracle: String =
    """WITH t AS (SELECT user_id, count(*) AS n_events
      |           FROM events GROUP BY 1),
      |p AS (SELECT user_id, count(*) AS n_purchases
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT t.user_id, t.n_events,
      |  CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases
      |FROM t LEFT JOIN p USING (user_id) ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f12_snapshot_diff" -> (f12SnapshotDiff _),
    "f11_bucketed_join" -> (f11BucketedJoin _),
    "f8_keyed_merge" -> (f8KeyedMerge _),
    "f9_snapshot_read" -> (f9SnapshotRead _),
    "f10_log_compaction" -> (f10LogCompaction _),
    "f7_compaction" -> (f7Compaction _),
    "f6_clustered_layout" -> (f6ClusteredLayout _),
    "f5_schema_evolution" -> (f5SchemaEvolution _),
    "f4_partitioned_source" -> (f4PartitionedSource _),
    "f1_jsonl_source" -> (f1JsonlSource _),
    "f2_csv_source" -> (f2CsvSource _),
    "f3_orc_source" -> (f3OrcSource _)
  )

  val oracles: Map[String, String] = Map(
    "f12_snapshot_diff" -> f12Oracle,
    "f8_keyed_merge" -> f8Oracle,
    "f9_snapshot_read" -> f9Oracle,
    // f10 shares f9's oracle VERBATIM: compaction must be invisible to
    // both the mid-history and the current read
    "f10_log_compaction" -> f9Oracle,
    "f7_compaction" -> roundtripOracle,
    "f11_bucketed_join" -> f11Oracle,
    "f6_clustered_layout" -> f6Oracle,
    "f5_schema_evolution" -> f5Oracle,
    "f4_partitioned_source" -> f4Oracle,
    "f1_jsonl_source" -> roundtripOracle,
    "f2_csv_source" -> roundtripOracle,
    "f3_orc_source" -> roundtripOracle
  )
}
