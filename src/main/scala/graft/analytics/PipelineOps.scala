package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline composition layer: the operators a pretraining
  * corpus build runs BETWEEN the per-document analytics (TextAnalytics) and
  * the dedup families (Dedup/NearDup) — as-of attribution joins,
  * deterministic stratified sampling, sequence packing (chunking), PII-style
  * redaction, and an end-to-end filter→dedup→sample→stats pipeline.
  *
  * Determinism discipline (r2 rules): every oracle-checked output is exact
  * integers, strings, or a single IEEE division of exact integers; sampling
  * uses md5 (identical lowercase hex in Spark and DuckDB), never `rand()`.
  *
  * Scale notes are per-operator; the common theme is one shuffle keyed by
  * the entity id, no all-pairs, no driver-side loops.
  */
object PipelineOps {

  import Tables._

  /** p1 — as-of join (point-in-time attribution): for each `purchase`
    * event, the latest `click` by the same user at-or-before it.
    *
    * Spark has no ASOF JOIN (DuckDB does — the oracle uses it); a range
    * join would explode to O(clicks × purchases) per user. Instead: union
    * both sides tagged, ONE shuffle by user_id, sort by
    * (time, side, click_id), and a running `last(click, ignoreNulls)`
    * window — the classic distributed merge-based as-of. Timestamp ties
    * are resolved by the sort itself: among clicks at the same
    * microsecond, `last` sees the max click_id (exactly what the oracle's
    * pre-collapsed `max(event_id)` picks), and a click at a purchase's
    * exact microsecond sorts first so it is visible (ASOF `>=`).
    *
    * 100 TB: cost is one shuffle + per-user sort; skew is bounded by the
    * hottest user's event count, with no quadratic term anywhere.
    */
  def p1AsofAttribution(s: SparkSession, d: String): DataFrame = {
    // ts is epoch-nanos BIGINT (nanosAsLong); compute in microseconds so
    // the oracle's epoch_us(ts) sees identical integers (q17 precision rule)
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
      col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id").as("p_id"))

    // side 0 = click, 1 = purchase
    val tagged = clicks.select(
        col("user_id"), col("us"), lit(0).as("side"),
        col("click_id"), lit(null).cast("long").as("p_id"))
      .unionByName(purchases.select(
        col("user_id"), col("us"), lit(1).as("side"),
        lit(null).cast("long").as("click_id"), col("p_id")))

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("side"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("p_id").isNotNull && col("last_click").isNotNull)
      .select(col("p_id"), col("user_id"), col("last_click").as("click_id"),
        (col("us") - col("click_us")).as("gap_us"))
      .orderBy(col("p_id"))
  }

  val p1Oracle: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
      |clicks AS (SELECT user_id, us, max(event_id) AS click_id
      |           FROM e WHERE event_type = 'click' GROUP BY 1, 2),
      |purch AS (SELECT event_id AS p_id, user_id, us
      |          FROM e WHERE event_type = 'purchase')
      |SELECT p.p_id, p.user_id, c.click_id, p.us - c.us AS gap_us
      |FROM purch p ASOF JOIN clicks c
      |  ON p.user_id = c.user_id AND p.us >= c.us
      |ORDER BY p_id""".stripMargin

  /** p2 — deterministic stratified sampling: per-language rates via a hex
    * threshold on md5(doc_id). Unlike `rand()`/TABLESAMPLE, the kept set is
    * a pure function of the data — reproducible across engines, runs, and
    * cluster sizes (the property a training-data pipeline actually needs
    * for ablations). en≈20%, zh≈40%, others≈60% of docs.
    *
    * 100 TB: shuffle-free — a codegen'd filter on a scan. */
  def p2StratifiedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
          .as("bucket"))
      .filter(col("bucket") < expr(
        "CASE lang WHEN 'en' THEN '33' WHEN 'zh' THEN '66' ELSE '99' END"))
      .orderBy(col("doc_id"))

  val p2Oracle: String =
    """SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |  CASE lang WHEN 'en' THEN '33' WHEN 'zh' THEN '66' ELSE '99' END
      |ORDER BY doc_id""".stripMargin

  /** p3 — sequence packing prep: split every document into fixed 32-word
    * windows (chunk text + its word count). The explode multiplies rows,
    * never bytes²; each chunk row carries only its own slice.
    *
    * 100 TB: narrow (no shuffle) — scan → explode → project; output
    * partitioning follows the input files. */
  /** Core chunker over any (doc_id, text) frame — [[p3TokenChunks]] binds
    * it to the documents table; the property spec feeds it random corpora. */
  def tokenChunks(docs: DataFrame, chunkWords: Int = 32): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0, (size(w)-1) div $chunkWords)")).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("chunk_id"),
        expr(s"array_join(slice(w, i*$chunkWords+1, $chunkWords), ' ')").as("chunk"),
        expr(s"size(slice(w, i*$chunkWords+1, $chunkWords))").cast("long").as("n_words"))

  def p3TokenChunks(s: SparkSession, d: String): DataFrame =
    tokenChunks(documents(s, d))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** p12 — OVERLAPPING (sliding-window) chunks: size-32 windows advancing
    * by stride 24, so consecutive chunks share 8 words — the RAG/embedding
    * chunking recipe (context preserved across chunk boundaries), vs p3's
    * disjoint packing-prep windows. Chunk i starts at word i·stride; the
    * last windows run short rather than padding, and every word lands in
    * ⌈size/stride⌉ chunks at most.
    *
    * Scale shape: identical to p3 — scan → explode → project, no shuffle;
    * the output multiplies rows by ~n/stride and bytes by size/stride. */
  def overlapChunks(docs: DataFrame, chunkWords: Int = 32, stride: Int = 24): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0, (size(w)-1) div $stride)")).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("chunk_id"),
        expr(s"array_join(slice(w, i*$stride+1, $chunkWords), ' ')").as("chunk"),
        expr(s"size(slice(w, i*$stride+1, $chunkWords))").cast("long").as("n_words"))

  def p12OverlapChunks(s: SparkSession, d: String): DataFrame =
    overlapChunks(documents(s, d))
      .orderBy(col("doc_id"), col("chunk_id"))

  val p12Oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, w, unnest(range(0, (len(w)-1)//24 + 1)) AS chunk_id FROM d)
      |SELECT doc_id, chunk_id,
      |  array_to_string(w[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk,
      |  len(w[chunk_id*24+1 : chunk_id*24+32]) AS n_words
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  val p3Oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, w, unnest(range(0, (len(w)-1)//32 + 1)) AS chunk_id FROM d)
      |SELECT doc_id, chunk_id,
      |  array_to_string(w[chunk_id*32+1 : chunk_id*32+32], ' ') AS chunk,
      |  len(w[chunk_id*32+1 : chunk_id*32+32]) AS n_words
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** p4 — PII-style redaction: mask a denylist of terms (word-boundary
    * regex, RE2-and-Java compatible) and count the masked hits per doc.
    *
    * 100 TB: shuffle-free codegen'd projection. */
  private val redactPattern = "\\b(customer|order|value|key)\\b"

  def p4Redact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        regexp_replace(col("text"), redactPattern, "<MASKED>").as("redacted"),
        regexp_count(col("text"), lit(redactPattern)).cast("long").as("n_masked"))
      .orderBy(col("doc_id"))

  val p4Oracle: String =
    """SELECT doc_id,
      |regexp_replace(text, '\b(customer|order|value|key)\b', '<MASKED>', 'g') AS redacted,
      |len(regexp_extract_all(text, '\b(customer|order|value|key)\b')) AS n_masked
      |FROM documents ORDER BY doc_id""".stripMargin

  /** p5 — the composed corpus build: quality filter (uniq ratio ≥ 0.5,
    * ≥ 20 words) → exact dedup on text (keep the lowest doc_id, its lang
    * via min_by) → 50% deterministic hash sample → per-language corpus
    * stats. One query exercising filter, dedup, sampling, and aggregation
    * as a single Catalyst plan (filters reach the scan; the only shuffles
    * are the dedup groupBy and the final small rollup).
    *
    * 100 TB: the dedup groupBy is the sole corpus-wide shuffle and it
    * follows d1's discipline — the shuffle key is the 8-byte
    * `xxhash64(text)` and rows carry only (hash, doc_id, lang, n_words),
    * never the text. The oracle groups the text itself: identical output
    * absent 64-bit collisions (same documented caveat as d1). */
  def p5QualityPipeline(s: SparkSession, d: String): DataFrame = {
    val wordsArr = split(col("text"), " ")
    val nWords = size(wordsArr).cast("long")
    val uniqRatio = size(array_distinct(wordsArr)).cast("double") / size(wordsArr)
    val kept = documents(s, d)
      .filter(nWords >= 20 && uniqRatio >= lit(0.5))
      .select(xxhash64(col("text")).as("h"), col("doc_id"), col("lang"),
        nWords.as("n_words"))
    val deduped = kept
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("n_words"), col("doc_id")).as("n_words"))
    val sampled = deduped
      .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "80")
    sampled
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        (sum(col("n_words")).cast("double") / count(lit(1))).as("avg_words"))
      .orderBy(col("lang"))
  }

  val p5Oracle: String =
    """WITH kept AS (
      |  SELECT doc_id, lang, text FROM documents
      |  WHERE len(string_split(text, ' ')) >= 20
      |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / len(string_split(text, ' ')) >= 0.5),
      |deduped AS (
      |  SELECT text, min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang
      |  FROM kept GROUP BY text),
      |sampled AS (
      |  SELECT * FROM deduped
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80')
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
      |  CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)
      |    / count(*) AS avg_words
      |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin

  /** p6 — mixture rebalance: downsample every (lang, source) stratum to
    * its language's smallest source so the per-language source mix is
    * uniform (the "domain reweighting" step of a corpus build). The keep
    * rule is pure integer arithmetic on doc_id (`doc_id % n_src < m`), so
    * the kept set is deterministic and engine-portable. Stratum sizes ride
    * on two broadcast joins (the aggregates are tiny); the corpus itself
    * is scanned once, filtered, re-aggregated.
    *
    * 100 TB: one full-scan + two broadcasts + one small shuffle — the
    * stats side is O(langs × sources), never corpus-sized. */
  def p6MixtureRebalance(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val counts = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_src"))
    val mins = counts.groupBy(col("lang")).agg(min(col("n_src")).as("m"))
    docs
      .join(broadcast(counts), Seq("lang", "source"))
      .join(broadcast(mins), Seq("lang"))
      .filter(pmod(col("doc_id"), col("n_src")) < col("m"))
      .groupBy(col("lang"), col("source"))
      .agg(first(col("n_src")).as("n_src"), count(lit(1)).as("n_kept"))
      .orderBy(col("lang"), col("source"))
  }

  val p6Oracle: String =
    """WITH counts AS (
      |  SELECT lang, source, count(*) AS n_src FROM documents GROUP BY 1, 2),
      |mins AS (SELECT lang, min(n_src) AS m FROM counts GROUP BY 1)
      |SELECT d.lang, d.source, c.n_src, count(*) AS n_kept
      |FROM documents d
      |JOIN counts c ON d.lang = c.lang AND d.source = c.source
      |JOIN mins mm ON d.lang = mm.lang
      |WHERE d.doc_id % c.n_src < mm.m
      |GROUP BY d.lang, d.source, c.n_src
      |ORDER BY d.lang, d.source""".stripMargin

  /** p7 — deterministic WEIGHTED sampling: each document is kept with
    * probability equal to its uniqueness ratio (higher-quality docs are
    * more likely to survive — the importance-sampling step of a corpus
    * build). The keep rule is the exact integer cross-product
    * `hash48 · n_words < n_uniq · 2^48`: a 48-bit md5-derived uniform
    * variate compared against the rational weight with no division and no
    * doubles anywhere, so it is reproducible and engine-portable (the same
    * trick as q20's above-average threshold). The cross-product is
    * evaluated in exact wide-decimal arithmetic (int128 on the DuckDB
    * side): `h48 · n_words ≤ 2^48 · 2^63` always fits in 38 digits, so —
    * unlike the r4 BIGINT form, which wrapped silently once a document hit
    * 32768 words (ADVICE r4) — the keep decision is exact for any document
    * Spark can hold. */
  def p7WeightedSample(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_uniq"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("h48"))
      .filter(col("h48").cast("decimal(38,0)") * col("n_words") <
        col("n_uniq").cast("decimal(38,0)") * lit(281474976710656L))
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_uniq"))
      .orderBy(col("doc_id"))
  }

  val p7Oracle: String =
    """SELECT doc_id, lang,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
      |FROM documents
      |WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS HUGEINT)
      |        * len(string_split(text, ' ')) <
      |      CAST(len(list_distinct(string_split(text, ' '))) AS HUGEINT) * 281474976710656
      |ORDER BY doc_id""".stripMargin

  /** p8 — batch INTERVAL join, the oracle twin of
    * [[graft.streaming.StreamJoin.attributionJoin]] (VERDICT r4 #4): ALL
    * clicks by the same user in the closed window
    * `[purchase_us − lookback, purchase_us]` — every qualifying pair, not
    * p1's latest-only refinement. Same contract as the stream-stream
    * interval join (`clickTs <= purchaseTs && clickTs >= purchaseTs −
    * lookback`), so the streaming operator's semantics are now
    * oracle-checked through this twin.
    *
    * Scale shape: a naive `user ⋈ user + range filter` degenerates to
    * O(clicks × purchases) per user. Instead each click lands in ONE
    * lookback-sized time bin and each purchase probes TWO (its own and the
    * previous — any in-window click is in one of them, and only one, so no
    * dedup pass is needed): the join is a plain equi-join on
    * (user_id, bin) whose fan-out is bounded by per-bin occupancy, the
    * standard distributed interval-join binning. */
  def p8IntervalJoin(s: SparkSession, d: String,
      lookbackUs: Long = 3600000000L): DataFrame = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
      col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"),
        col("event_id").as("click_id"), expr(s"us div $lookbackUs").as("bin"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"), col("event_id").as("p_id"))
      .withColumn("bin",
        explode(array(expr(s"p_us div $lookbackUs") - 1, expr(s"p_us div $lookbackUs"))))
    purchases.join(clicks, Seq("user_id", "bin"))
      .filter(col("c_us") <= col("p_us") && col("c_us") >= col("p_us") - lookbackUs)
      .select(col("p_id"), col("user_id"), col("click_id"),
        (col("p_us") - col("c_us")).as("gap_us"))
      .orderBy(col("p_id"), col("click_id"))
  }

  val p8Oracle: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events)
      |SELECT p.event_id AS p_id, p.user_id, c.event_id AS click_id,
      |  p.us - c.us AS gap_us
      |FROM e p JOIN e c
      |  ON c.user_id = p.user_id
      | AND c.us BETWEEN p.us - 3600000000 AND p.us
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |ORDER BY p_id, click_id""".stripMargin

  /** p9 — per-SOURCE QUOTA CAP: keep at most `cap` documents per source,
    * selected deterministically by md5(doc_id) hash order — the "cap docs
    * per domain" step every web-scale corpus build runs so no single crawl
    * source dominates the mixture. Reports per-source total vs kept plus a
    * kept-set checksum, so the oracle pins exactly WHICH documents survive.
    *
    * Scale shape: the keep rule is `row_number() ≤ cap` per source, which
    * Catalyst rewrites to a partial WindowGroupLimit BEFORE the shuffle —
    * each map partition forwards at most `cap` rows per source, so the
    * exchange carries O(partitions · cap) rows per source no matter how hot
    * the source is (gated in PlanSpec). The totals side is a plain
    * partial+final count. A `sum(CASE rk ≤ cap)` formulation would defeat
    * the pushdown — every row would cross the shuffle just to be discarded
    * by the flag. */
  def p9SourceCap(s: SparkSession, d: String, cap: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    val kept = docs
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string").cast("binary")).as("hk"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    totals.join(kept, "source")
      .select(col("source"), col("n_total"), col("n_kept"), col("kept_id_sum"))
      .orderBy(col("source"))
  }

  val p9Oracle: String =
    """WITH h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hk
      |  FROM documents),
      |r AS (SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
      |  FROM h),
      |kept AS (SELECT source, count(*) AS n_kept,
      |    CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
      |  FROM r WHERE rk <= 20 GROUP BY 1),
      |totals AS (SELECT source, count(*) AS n_total FROM documents GROUP BY 1)
      |SELECT source, n_total, n_kept, kept_id_sum
      |FROM totals JOIN kept USING (source) ORDER BY source""".stripMargin

  /** p10 — deterministic TRAIN/VAL/TEST SPLIT: assign every document to a
    * split by md5(doc_id) bucket (‰ thresholds 900/950), the standard
    * hash-split that stays stable as the corpus grows — a document's split
    * never changes when other documents are added or removed, which is the
    * property random sampling can't give and the reason eval contamination
    * audits insist on hash splits. Reports per-split count plus id
    * sum/min/max, so the oracle pins the exact assignment, not just sizes.
    *
    * Scale shape: the split key is a pure column expression (no shuffle to
    * assign); the only shuffle is the 3-group aggregate, partial+final. */
  def p10Split(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000
    documents(s, d)
      .withColumn("split",
        when(bucket < 900, lit("train"))
          .when(bucket < 950, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("split"))
  }

  val p10Oracle: String =
    """WITH b AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |      % 1000 AS bucket
      |  FROM documents),
      |sp AS (SELECT doc_id, CASE WHEN bucket < 900 THEN 'train'
      |    WHEN bucket < 950 THEN 'val' ELSE 'test' END AS split FROM b)
      |SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM sp GROUP BY 1 ORDER BY split""".stripMargin

  /** p17 — LEAKAGE-SAFE train/val/test split: p10's hash split with one
    * additional rule — every member of a near-dup cluster (n4's connected
    * components over the MinHash pair graph) keys its split by the CLUSTER
    * representative, not its own id, so near-duplicate documents can never
    * straddle train and test. This closes the classic eval-contamination
    * hole hash splits leave open: two 95%-identical crawls of the same
    * page hash to independent buckets and leak test content into train.
    * Reports p10's per-split stats plus how many clustered docs landed in
    * each split, so the oracle pins the exact assignment.
    *
    * Scale shape: the cluster labels are n4's output (banded-LSH
    * candidates + label propagation — id-only shuffles); attaching them is
    * one left join on doc_id, and the label side is the near-dup subset
    * (≪ corpus). Split assignment stays a pure column expression; the
    * only new corpus-wide shuffle is the label join. */
  def p17LeakageSafeSplit(s: SparkSession, d: String): DataFrame = {
    val clusters = NearDup.stagedClusters(s, d)
      .select(col("doc_id"), col("cluster_id"))
    val keyed = documents(s, d).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
    val bucket = conv(substring(
      md5(col("split_key").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000
    keyed
      .withColumn("split",
        when(bucket < 900, lit("train"))
          .when(bucket < 950, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L))
          .as("n_clustered"))
      .orderBy(col("split"))
  }

  /** p17 oracle — n4's recursive-CTE component derivation verbatim as a
    * CTE (the n7 pattern), then p10's md5 bucket rule on the coalesced
    * split key. */
  def p17Oracle: String =
    s"""WITH clusters AS (${NearDup.minhashClustersOracle}),
      |k AS (SELECT d.doc_id, c.cluster_id,
      |    coalesce(c.cluster_id, d.doc_id) AS split_key
      |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
      |b AS (SELECT doc_id, cluster_id,
      |    CAST('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8) AS BIGINT)
      |      % 1000 AS bucket
      |  FROM k),
      |sp AS (SELECT doc_id, cluster_id, CASE WHEN bucket < 900 THEN 'train'
      |    WHEN bucket < 950 THEN 'val' ELSE 'test' END AS split FROM b)
      |SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id,
      |  CAST(sum(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clustered
      |FROM sp GROUP BY 1 ORDER BY split""".stripMargin

  /** p18 — SPLIT-LEAKAGE AUDIT: for each split rule (p10 naive hash,
    * p17 cluster-keyed), count verified near-dup pairs (n1's output) that
    * STRADDLE two different splits — the eval-contamination metric a
    * corpus release report publishes. The audit demonstrates, under the
    * oracle gate, exactly what p17 buys: the naive row must show the
    * leakage pairs and the cluster-keyed row must show ZERO (members of
    * a pair share a component, hence a split key, by construction).
    *
    * Scale shape: the pair list is the near-dup output (≪ corpus); split
    * assignment attaches by two id joins. Nothing here rescans text. */
  def p18SplitLeakageAudit(s: SparkSession, d: String): DataFrame = {
    // ONE staged near-dup pass feeds both the pair list and the
    // clustering (r14): both sides read the family's StageCache stages,
    // so the sharing is structural across ALL consumers (n1/n4/n6/n7/
    // d13/p17/p18), not just within this query — and the staged parquet
    // needs no private .cache() copy.
    val pairs = NearDup.stagedNearDupPairs(s, d)
      .select(col("doc_a"), col("doc_b"))
    val clusters = NearDup.stagedClusters(s, d)
      .select(col("doc_id"), col("cluster_id"))
    def bucketOf(c: Column): Column = conv(substring(
      md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long") % 1000
    def splitOf(c: Column): Column =
      when(bucketOf(c) < 900, lit("train"))
        .when(bucketOf(c) < 950, lit("val"))
        .otherwise(lit("test"))
    val assigns = documents(s, d).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        splitOf(col("doc_id")).as("naive"),
        splitOf(coalesce(col("cluster_id"), col("doc_id"))).as("safe"))
    val joined = pairs
      .join(assigns.select(col("doc_id").as("doc_a"),
        col("naive").as("na"), col("safe").as("sa")), "doc_a")
      .join(assigns.select(col("doc_id").as("doc_b"),
        col("naive").as("nb"), col("safe").as("sb")), "doc_b")
    joined.select(lit("p10_naive").as("rule"),
        when(col("na") =!= col("nb"), 1L).otherwise(0L).as("x"))
      .unionByName(joined.select(lit("p17_cluster_keyed").as("rule"),
        when(col("sa") =!= col("sb"), 1L).otherwise(0L).as("x")))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("n_cross_split"))
      .orderBy(col("rule"))
  }

  /** p18 oracle — n1's brute-force pair set + n4's recursive components +
    * both split rules, composed; the p17 row's n_cross_split pins to 0. */
  def p18Oracle: String =
    s"""WITH pairs AS (${NearDup.minhashOracle}),
      |clusters AS (${NearDup.minhashClustersOracle}),
      |a AS (SELECT d.doc_id,
      |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS nb,
      |    CAST('0x' || substr(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS sb
      |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
      |sp AS (SELECT doc_id,
      |    CASE WHEN nb < 900 THEN 'train' WHEN nb < 950 THEN 'val' ELSE 'test' END AS naive,
      |    CASE WHEN sb < 900 THEN 'train' WHEN sb < 950 THEN 'val' ELSE 'test' END AS safe
      |  FROM a),
      |j AS (SELECT p.doc_a, p.doc_b, x.naive AS na, x.safe AS sa, y.naive AS nbs, y.safe AS sbs
      |  FROM pairs p JOIN sp x ON x.doc_id = p.doc_a JOIN sp y ON y.doc_id = p.doc_b),
      |u AS (SELECT 'p10_naive' AS rule, CASE WHEN na <> nbs THEN 1 ELSE 0 END AS x FROM j
      |      UNION ALL
      |      SELECT 'p17_cluster_keyed', CASE WHEN sa <> sbs THEN 1 ELSE 0 END FROM j)
      |SELECT rule, count(*) AS n_pairs, CAST(sum(x) AS BIGINT) AS n_cross_split
      |FROM u GROUP BY 1 ORDER BY rule""".stripMargin

  /** p11 — SEQUENCE PACKING: concatenate documents into fixed-budget
    * training sequences (512 tokens) and report, per document, where it
    * lands — shard, token offset, first sequence id, and how many sequences
    * it spans. This is the GPT-style "concat and chunk" data-prep step that
    * turns a deduped corpus into equal-length training rows; emitting the
    * placement (rather than materializing the packed text) is what the
    * downstream loader actually needs, and keeps every column integer-exact.
    *
    * Scale shape: packing order must be sequential, so it is made
    * shard-local — the corpus is split into deterministic md5(doc_id)
    * shards (`spark.graft.pack.shards`, default 64; production scales this
    * with corpus size exactly like input-file sharding) and the running
    * token offset is a window running-sum within the shard, ordered by
    * doc_id. Rows per shard = |corpus| / shards, a configuration decision,
    * not a hotspot: the shard key is uniform md5, immune to content skew
    * (contrast t9's forbidden token-window). One exchange total. */
  def p11PackSequences(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards = s.conf.getOption("spark.graft.pack.shards").map(_.toInt).getOrElse(64)
    val budget = 512
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, d)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
          .cast("long") % shards).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("tok_offset", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("tok_offset"),
        expr(s"tok_offset div $budget").as("seq_first"),
        (expr(s"(tok_offset + n_tok - 1) div $budget")
          - expr(s"tok_offset div $budget") + 1).as("n_seqs"))
      .orderBy(col("doc_id"))
  }

  val p11Oracle: String =
    """WITH t AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
      |      % 64 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |o AS (SELECT doc_id, shard, n_tok,
      |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |                     ROWS UNBOUNDED PRECEDING) - n_tok AS tok_offset
      |  FROM t)
      |SELECT doc_id, shard, n_tok, CAST(tok_offset AS BIGINT) AS tok_offset,
      |  CAST(tok_offset // 512 AS BIGINT) AS seq_first,
      |  CAST((tok_offset + n_tok - 1) // 512 - tok_offset // 512 + 1 AS BIGINT)
      |    AS n_seqs
      |FROM o ORDER BY doc_id""".stripMargin

  /** p13 — the QUALITY FUNNEL report: document and word survival counts
    * after each stage of p5's corpus build (raw → quality filter → exact
    * dedup → hash sample) — the observability artifact every curation run
    * publishes so a stage that silently eats the corpus is visible. Stage
    * predicates are IDENTICAL to p5's (same filter, same xxhash64 dedup
    * keep-min rule, same md5 sample), so the funnel's last row reconciles
    * exactly with p5's output totals.
    *
    * Scale shape: one aggregate row per stage; the only corpus-wide
    * shuffle is the dedup groupBy (8-byte hash key) that stages 2-3
    * already need. The four stages share lineage, so the scan and filter
    * work is computed once per branch Catalyst can't fuse — at 100 TB
    * this is a report you run WITH the build, not a second pass. */
  def p13QualityFunnel(s: SparkSession, d: String): DataFrame = {
    val wordsArr = split(col("text"), " ")
    val nWords = size(wordsArr).cast("long")
    val uniqRatio = size(array_distinct(wordsArr)).cast("double") / size(wordsArr)
    val raw = documents(s, d).select(col("doc_id"), col("lang"),
      nWords.as("n_words"), col("text"))
    val kept = raw.filter(col("n_words") >= 20 && uniqRatio >= lit(0.5))
    val deduped = kept
      .select(xxhash64(col("text")).as("h"), col("doc_id"), col("n_words"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"), min_by(col("n_words"), col("doc_id")).as("n_words"))
    val sampled = deduped
      .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "80")
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"))
        .select(lit(name).as("stage"), col("n_docs"), col("total_words"))
    stage("0_raw", raw)
      .unionByName(stage("1_quality", kept))
      .unionByName(stage("2_dedup", deduped))
      .unionByName(stage("3_sample", sampled))
      .orderBy(col("stage"))
  }

  val p13Oracle: String =
    """WITH raw AS (SELECT doc_id, text, len(string_split(text, ' ')) AS n_words
      |  FROM documents),
      |kept AS (SELECT * FROM raw WHERE n_words >= 20
      |  AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / n_words >= 0.5),
      |deduped AS (SELECT min(doc_id) AS doc_id, min_by(n_words, doc_id) AS n_words
      |  FROM kept GROUP BY text),
      |sampled AS (SELECT * FROM deduped
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80')
      |SELECT '0_raw' AS stage, count(*) AS n_docs,
      |  CAST(sum(n_words) AS BIGINT) AS total_words FROM raw
      |UNION ALL SELECT '1_quality', count(*), CAST(sum(n_words) AS BIGINT) FROM kept
      |UNION ALL SELECT '2_dedup', count(*), CAST(sum(n_words) AS BIGINT) FROM deduped
      |UNION ALL SELECT '3_sample', count(*), CAST(sum(n_words) AS BIGINT) FROM sampled
      |ORDER BY stage""".stripMargin

  /** p14 — GLOBAL RANK without a global window: curriculum ordering
    * (longest documents first, doc_id tiebreak) assigned as
    * `global_pos = (rows in strictly-better buckets) + (rank within my
    * bucket)`. A naive `row_number() OVER (ORDER BY ...)` funnels the
    * entire corpus through ONE partition — the canonical global-sort
    * scale-killer; here the only unpartitioned window runs over the
    * BUCKET HISTOGRAM (distinct n_words values — bounded and tiny
    * relative to the corpus), and the per-bucket rank windows partition
    * by n_words, so every corpus-sized operator is parallel.
    *
    * Scale knob (documented): bucket cardinality must be ≪ corpus and
    * per-bucket row counts must be splittable-small; for a continuous
    * score, quantize to fixed-width buckets first and rank the residual
    * within buckets — same two-phase shape. */
  def p14GlobalRank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_words"))
    val offsets = docs.groupBy(col("n_words")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("n_words").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n_words"), col("offset"))
    docs
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("n_words")).orderBy(col("doc_id"))).cast("long"))
      .join(broadcast(offsets), "n_words")
      .select(col("doc_id"), col("n_words"),
        (col("offset") + col("lr")).as("global_pos"))
      .orderBy(col("global_pos"))
  }

  val p14Oracle: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
      |  row_number() OVER (ORDER BY len(string_split(text, ' ')) DESC, doc_id)
      |    AS global_pos
      |FROM documents ORDER BY global_pos""".stripMargin

  /** p15 — TEMPERATURE-based mixture sampling (the multilingual-corpus
    * α-smoothing of mC4/XLM-R, at α = 0.5): each source keeps fraction
    * f_s = √(n_min / n_s) — square-root smoothing BETWEEN p6's full
    * uniformization (n_min/n_s) and no rebalance at all, so large
    * sources still dominate but sub-linearly. The keep rule hashes
    * doc_id to a 52-bit uniform in [0, 1) (13 md5 hex digits — exactly
    * representable in a double) and keeps u < f_s; f_s is one IEEE
    * division then one IEEE sqrt, both correctly rounded, so the
    * decision is bit-identical cross-engine and reproducible under
    * corpus growth of OTHER sources (a doc's fate depends only on its
    * id and its own stratum's size).
    *
    * Scale shape: one tiny per-source count aggregate, broadcast back
    * onto the scan; the filter is a pure column predicate — no
    * corpus-wide shuffle at all. */
  def p15TemperatureMix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // n_min rides an unpartitioned window over the per-source AGGREGATE
    // (≤ |sources| rows — the p14 bucket-histogram pattern), never a
    // 1-row cross join (a broadcast 1-row join degenerates to the
    // unconditioned BNLJ the global plan gate forbids)
    val counts = documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_min", min(col("n_docs")).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val frac = sqrt(col("n_min").cast("double") / col("n_docs"))
    val u = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52
    documents(s, d)
      .join(broadcast(counts), "source")
      .withColumn("keep", u < frac)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("keep").cast("long")).as("n_kept"),
        first(frac).as("keep_frac"))
      .orderBy(col("source"))
  }

  val p15Oracle: String =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |m AS (SELECT min(n_docs) AS n_min FROM c),
      |k AS (SELECT d.source,
      |    CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13) AS BIGINT)
      |      AS DOUBLE) / 4503599627370496.0
      |      < sqrt(CAST(n_min AS DOUBLE) / n_docs) AS keep,
      |    sqrt(CAST(n_min AS DOUBLE) / n_docs) AS keep_frac
      |  FROM documents d JOIN c USING (source) CROSS JOIN m)
      |SELECT source, count(*) AS n_total,
      |  CAST(sum(CAST(keep AS BIGINT)) AS BIGINT) AS n_kept,
      |  first(keep_frac) AS keep_frac
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** p16 — EPOCH-SEEDED RESHUFFLE order: each training epoch visits the
    * corpus in a fresh deterministic permutation, keyed by
    * md5(epoch:doc_id) — reproducible across runs and machines (the
    * property `rand()`-based shuffles lose), and O(1) to recompute for
    * any (epoch, doc) pair, so a resumed job re-derives its position
    * without stored state. The query emits each epoch's first 5
    * documents; the rank filter lowers to a map-side partial
    * WindowGroupLimit (the p9/t11 lever), so each task forwards ≤ 5
    * rows per epoch and the epoch-partitioned window never becomes the
    * corpus-wide hotspot a full materialized sort would be.
    *
    * At scale the full per-epoch order is CONSUMED, not materialized:
    * downstream reads sort ranges of the md5 key (range partition on the
    * key = the p14 two-phase pattern); the top-k here pins the
    * permutation's determinism under the oracle. */
  def p16EpochOrder(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epochs = documents(s, d)
      .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("epoch"))
      .withColumn("k", md5(concat(col("epoch"), lit(":"), col("doc_id")).cast("binary")))
    val w = Window.partitionBy(col("epoch")).orderBy(col("k"), col("doc_id"))
    epochs
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= 5)
      .select(col("epoch"), col("pos"), col("doc_id"))
      .orderBy(col("epoch"), col("pos"))
  }

  val p16Oracle: String =
    """WITH e AS (SELECT doc_id, t.epoch,
      |    md5(CAST(t.epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch) t),
      |r AS (SELECT epoch, doc_id,
      |    row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos
      |  FROM e)
      |SELECT CAST(epoch AS BIGINT) AS epoch, pos, doc_id
      |FROM r WHERE pos <= 5 ORDER BY epoch, pos""".stripMargin

  /** p19 — WINSORIZATION AUDIT via exact distributed selection: per event
    * type, the exact P1/P99 order statistics of `value` (k-th smallest
    * under the (value, event_id) total order, k = 1 + ⌊q·(n−1)⌋ — pure
    * integer rank arithmetic) plus the clip counts — the outlier-bounding
    * report a feature/reward pipeline runs before normalization, where
    * the tail cut must be auditable, not approximate.
    *
    * Scale shape (the p14 bucket-histogram pattern applied to SELECTION —
    * a full `row_number` over each type partition is the single-partition
    * window trap): phase 1 folds the corpus to a (type, ⌊value⌋) histogram
    * and walks the TINY cumulative table to locate the bucket holding
    * rank k and the rank offset within it; phase 2 ranks ONLY inside the
    * located buckets (occupancy n/buckets, joined via a broadcast of ≤
    * 2·|types| target rows). The corpus is touched twice, both times as
    * partial+final folds; no partition ever holds a full type. The oracle
    * replays the naive window — equality IS the proof the two-phase
    * selection picks the identical element. */
  def p19Winsorize(s: SparkSession, d: String): DataFrame = {
    // No persist: the three remaining consumers (histogram, in-bucket
    // rank, clip scan) each re-SCAN a 3-column parquet projection — cheap
    // by construction, unlike t10's recomputed explode+md5 subtree — and
    // pinning a corpus-sized cache for one query would tax the whole
    // session's block manager. Counts derive from the histogram, not a
    // fourth scan.
    val ev = events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
    val hist = ev
      .groupBy(col("event_type"), floor(col("value")).as("bkt"))
      .agg(count(lit(1)).as("bn"))
    val counts = hist.groupBy(col("event_type")).agg(sum(col("bn")).as("n"))
    val targets = counts.selectExpr("event_type", "n",
      "stack(2, 'p01', 1L + (n - 1L) div 100L, 'p99', 1L + (99L * (n - 1L)) div 100L) AS (q, k)")
    val wB = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before", coalesce(sum(col("bn")).over(wB), lit(0L)))
    val located = targets.join(cum, "event_type")
      .filter(col("cum_before") < col("k") &&
        col("k") <= col("cum_before") + col("bn"))
      .select(col("event_type"), col("q"), col("bkt"),
        (col("k") - col("cum_before")).as("k_in"))
    val wIn = Window.partitionBy(col("event_type"), col("q"))
      .orderBy(col("value"), col("event_id"))
    val quantiles = ev.withColumn("bkt", floor(col("value")))
      .join(broadcast(located), Seq("event_type", "bkt"))
      .withColumn("rn", row_number().over(wIn))
      .filter(col("rn") === col("k_in"))
      .groupBy(col("event_type"))
      .agg(max(when(col("q") === "p01", col("value"))).as("p01"),
        max(when(col("q") === "p99", col("value"))).as("p99"))
    ev.join(broadcast(quantiles), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("p01")).as("p01"), max(col("p99")).as("p99"),
        sum(when(col("value") < col("p01"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("value") > col("p99"), 1L).otherwise(0L)).as("n_above"))
      .orderBy(col("event_type"))
  }

  val p19Oracle: String =
    """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |k AS (SELECT event_type, n, 1 + (n - 1) // 100 AS k_lo,
      |        1 + (99 * (n - 1)) // 100 AS k_hi FROM c),
      |r AS (SELECT event_type, value,
      |        row_number() OVER (PARTITION BY event_type
      |          ORDER BY value, event_id) AS rn
      |      FROM events),
      |q AS (SELECT k.event_type,
      |        max(CASE WHEN rn = k_lo THEN value END) AS p01,
      |        max(CASE WHEN rn = k_hi THEN value END) AS p99
      |      FROM k JOIN r ON r.event_type = k.event_type
      |        AND (rn = k_lo OR rn = k_hi)
      |      GROUP BY 1)
      |SELECT q.event_type, count(*) AS n, q.p01, q.p99,
      |  CAST(sum(CASE WHEN e.value < q.p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |  CAST(sum(CASE WHEN e.value > q.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
      |FROM q JOIN events e ON e.event_type = q.event_type
      |GROUP BY 1, 3, 4 ORDER BY q.event_type""".stripMargin

  /** p20 — THE END-TO-END PRETRAIN PIPELINE as ONE declarative plan: the
    * flagship composition proving the stage operators chain the way a
    * real corpus build runs them —
    *
    *   quality filter (t12's Gopher rules minus the 50-word floor, which
    *   would empty this corpus) → exact dedup, first-occurrence keeps
    *   (d1's rule) → benchmark decontamination (d3's word-5-gram overlap
    *   against the doc_id < 20 benchmark set) → deterministic hash split
    *   (p10's md5-bucket rule) → per-split doc/token accounting.
    *
    * Every stage reuses the exact rule its standalone operator gates, so
    * the single chained oracle pins the COMPOSITION: a doc dropped at the
    * wrong stage, deduped against a filtered-out twin, or split before
    * decontamination breaks the hash. Catalyst sees the whole chain as
    * one plan — filters fuse into the scan, the dedup and shingle joins
    * order freely, and nothing materializes between stages.
    *
    * Scale shape: stage 1 is a fused scan-filter (no shuffle); stage 2
    * is d1's 16-byte-hash groupBy + keep-id equi-join; stage 3 streams
    * survivors through one shingle pass against a BROADCAST benchmark
    * set and drops via anti-join; stages 4–5 are one partial+final
    * aggregation on the 3-value split key. The corpus text never
    * shuffles — only (hash, id) pairs and shingle longs do. */
  def p20PretrainPipeline(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Views.sql(s, documents(s, d), "graft_docs_p20_v",
      """WITH src AS (SELECT doc_id, text, split(text, ' ') AS ws,
        |    split(regexp_replace(lower(text), '\\s+', ' '), ' ') AS nws
        |  FROM graft_docs_p20_v),
        |q AS (SELECT doc_id, text, ws FROM src
        |  WHERE doc_id >= 20
        |    AND 3 * size(ws) <= length(replace(text, ' ', ''))
        |    AND length(replace(text, ' ', '')) <= 10 * size(ws)
        |    AND 5 * size(filter(ws, w -> w RLIKE '[a-zA-Z]')) >= 4 * size(ws)
        |    AND size(filter(ws,
        |      w -> w IN ('the','a','of','and','to','in','is','it'))) >= 2),
        |k AS (SELECT md5(text) AS h, min(doc_id) AS keep_id
        |  FROM q GROUP BY md5(text)),
        |dd AS (SELECT q.doc_id, q.ws FROM q
        |  JOIN k ON md5(q.text) = k.h AND q.doc_id = k.keep_id),
        |bench AS (SELECT DISTINCT h FROM (
        |  SELECT explode(graft_shingle_hashes(nws, 5)) AS h
        |  FROM src WHERE doc_id < 20)),
        |con AS (SELECT DISTINCT c.doc_id FROM (
        |    SELECT doc_id, explode(graft_shingle_hashes(nws, 5)) AS h
        |    FROM src WHERE doc_id >= 20) c
        |  JOIN bench ON c.h = bench.h),
        |clean AS (SELECT dd.doc_id, dd.ws FROM dd
        |  LEFT ANTI JOIN con ON dd.doc_id = con.doc_id),
        |sp AS (SELECT doc_id, CAST(size(ws) AS BIGINT) AS ntok,
        |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM (SELECT doc_id, ws,
        |      CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)),
        |        1, 8), 16, 10) AS BIGINT) % 1000 AS b
        |    FROM clean))
        |SELECT split, count(1) AS n_docs, sum(ntok) AS n_tokens,
        |  sum(doc_id) AS id_sum
        |FROM sp GROUP BY split ORDER BY split""".stripMargin)
  }

  /** p20 oracle — the whole chain re-derived: Gopher-lite predicates,
    * min-id-per-md5 keeps, STRING 5-gram benchmark overlap (the d3
    * equivalence: hash vs string shingles agree modulo collisions,
    * absent at gate SF), p10's bucket rule, and the split accounting. */
  val p20Oracle: String =
    """WITH src AS (SELECT doc_id, text, string_split(text, ' ') AS ws,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS nws
      |  FROM documents),
      |q AS (SELECT doc_id, text, ws FROM src
      |  WHERE doc_id >= 20
      |    AND 3 * len(ws) <= length(replace(text, ' ', ''))
      |    AND length(replace(text, ' ', '')) <= 10 * len(ws)
      |    AND 5 * len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))
      |      >= 4 * len(ws)
      |    AND len(list_filter(ws,
      |      x -> x IN ('the','a','of','and','to','in','is','it'))) >= 2),
      |k AS (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM q GROUP BY 1),
      |dd AS (SELECT q.doc_id, q.ws FROM q
      |  JOIN k ON md5(q.text) = k.h AND q.doc_id = k.keep_id),
      |sh AS (SELECT doc_id, CASE WHEN len(nws) >= 5 THEN
      |    list_distinct(list_transform(generate_series(1, len(nws) - 4),
      |      i -> nws[i]||' '||nws[i+1]||' '||nws[i+2]||' '||nws[i+3]||' '||nws[i+4]))
      |  ELSE [] END AS s5 FROM src),
      |bench AS (SELECT DISTINCT g FROM (
      |  SELECT unnest(s5) AS g FROM sh WHERE doc_id < 20) t),
      |con AS (SELECT DISTINCT c.doc_id FROM (
      |    SELECT doc_id, unnest(s5) AS g FROM sh WHERE doc_id >= 20) c
      |  JOIN bench USING (g)),
      |clean AS (SELECT dd.doc_id, dd.ws FROM dd ANTI JOIN con USING (doc_id)),
      |sp AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS ntok,
      |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM (SELECT doc_id, ws,
      |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |        % 1000 AS b
      |    FROM clean) t)
      |SELECT split, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM sp GROUP BY 1 ORDER BY split""".stripMargin

  /** p21 — TOKEN-BUDGET APPORTIONMENT (largest-remainder / Hamilton
    * rounding): given a global token budget, allocate per-source quotas
    * proportional to each source's token mass such that the allocations
    * sum EXACTLY to the budget — the step between deciding mixture
    * weights (p6/p15) and actually drawing documents (p7/p9): a sampler
    * fed naive `round(w·B)` quotas over- or under-shoots the budget by
    * up to |sources|/2 and the training run silently drifts from its
    * token target. Floor allocations + distribute the remainder by
    * largest fractional part (exact integer remainders, ties to the
    * smaller source name) is the classical apportionment fix, and it is
    * all BIGINT arithmetic — the oracle replays it bit-for-bit.
    *
    * Scale shape: one (source) partial+final aggregation folds the
    * corpus to |sources| rows; everything after runs on that tiny table
    * (the unpartitioned rank window is over ≤|sources| rows — the p14
    * bucket-histogram discipline). */
  def p21TokenBudgetAlloc(s: SparkSession, d: String,
      budget: Long = 10000L): DataFrame = {
    Views.sql(s, documents(s, d), "graft_docs_p21_v",
      s"""WITH m AS (SELECT source, sum(size(split(text, ' '))) AS mass
        |    FROM graft_docs_p21_v GROUP BY source),
        |t AS (SELECT sum(mass) AS tm FROM m),
        |a AS (SELECT source, mass, ($budget * mass) div tm AS fl,
        |    ($budget * mass) % tm AS rem
        |  FROM m CROSS JOIN t),
        |r AS (SELECT source, mass, fl, rem,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM a),
        |need AS (SELECT $budget - sum(fl) AS extra FROM a)
        |SELECT source, mass,
        |  fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS alloc
        |FROM r CROSS JOIN need ORDER BY source""".stripMargin)
  }

  val p21Oracle: String =
    """WITH m AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |      AS mass
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(mass) AS BIGINT) AS tm FROM m),
      |a AS (SELECT source, mass, (10000 * mass) // tm AS fl,
      |    (10000 * mass) % tm AS rem
      |  FROM m CROSS JOIN t),
      |r AS (SELECT source, mass, fl, rem,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM a),
      |need AS (SELECT 10000 - CAST(sum(fl) AS BIGINT) AS extra FROM a)
      |SELECT source, mass,
      |  CAST(fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM r CROSS JOIN need ORDER BY source""".stripMargin

  /** p22 — CURRICULUM / ANNEAL SCHEDULE (the two-phase data schedule of
    * modern pretraining — MiniCPM's decay phase, LLaMA-3's annealing:
    * train the bulk phase on the broad mix, then spend the final ~20%
    * of the token budget on the highest-quality slice only). Composes
    * t24's per-source perplexity terciles with two exact-integer
    * apportionments:
    *
    *   - MAIN phase: buckets 1–2 (t24's kept set), budget = 4/5 of the
    *     kept bigram mass, allocated across sources by p15's α = 0.5
    *     temperature rule staged as INTEGER weights w_s =
    *     floor(sqrt(mass_s)) (one IEEE sqrt + floor — identical in both
    *     engines) and Hamilton-rounded by p21's largest-remainder rule;
    *   - ANNEAL phase: bucket 1 only (lowest perplexity), budget = the
    *     remaining 1/5, allocated proportional to head mass, same
    *     largest-remainder rule.
    *
    * Allocations sum EXACTLY to their phase budgets (the p21 invariant),
    * so the two-phase run hits the total token target to the token.
    *
    * Scale shape: everything corpus-sized is t24's chain (t22's
    * ReuseExchange'd staging + one |docs|-row source join); the schedule
    * arithmetic runs on ≤ 2·|sources| rows, and the two 1-row totals
    * ride the sanctioned bounded cross join (the p21/t22 shape). */
  def p22CurriculumSchedule(s: SparkSession, d: String): DataFrame = {
    // TWO-STEP on Spark: the schedule arithmetic references the
    // per-source masses from five different aggregates, and inlined as
    // one query each reference re-executes the whole corpus-sized t24
    // chain (measured 7.8 s vs t24's 2.2 s at sf0.1). The masses land
    // in scratch parquet through the NORMAL insert path — the chain
    // keeps AQE's runtime join selection, which a localCheckpoint pin
    // (Dataset.rdd compiles without AQE) loses: the pinned variants
    // measured 2-4× slower at sf30 — and the schedule then runs on the
    // ≤|sources|-row re-read. The DuckDB oracle stays one query (its
    // CTEs materialize once by default).
    val out = s"${Scratch.dir("graft-p22")}/bb"
    Views.sqlN(s,
      Seq(TextAnalytics.knPerdocStaged(s, d) -> "graft_perdoc_p22_v",
        documents(s, d) -> "graft_docs_p22_v"),
      p22MassSql("graft_perdoc_p22_v", "graft_docs_p22_v"))
      .write.parquet(out)
    Views.sql(s, s.read.parquet(out), "graft_p22_bb_v",
      "WITH " + p22ScheduleCtes("graft_p22_bb_v", duck = false))
  }

  /** Per-source (main, head) bigram masses over t24's tercile labels —
    * the Spark-side step-1 text, reading t22's staged per-doc table
    * (VERDICT r11 #3) instead of re-executing the KN chain. */
  private def p22MassSql(perdocRel: String, docsRel: String): String =
    TextAnalytics.perplexityLabStagedSql(perdocRel, docsRel) + """,
       |bb AS (SELECT source,
       |    sum(n_bigrams) AS main_mass,
       |    sum(CASE WHEN bucket = 1 THEN n_bigrams ELSE 0 END)
       |      AS head_mass
       |  FROM lab WHERE bucket <= 2 GROUP BY source)
       |SELECT source, main_mass, head_mass FROM bb""".stripMargin

  /** The schedule arithmetic from the per-source mass table `bbRel` to
    * the final phase table — shared between Spark's step 2 and the
    * oracle's tail. */
  private def p22ScheduleCtes(bbRel: String, duck: Boolean): String = {
    val dv = if (duck) "//" else "div"
    def big(x: String) = if (duck) s"CAST($x AS BIGINT)" else x
    s"""tot AS (SELECT ${big("sum(main_mass)")} AS tm,
       |    ${big("sum(head_mass)")} AS th FROM $bbRel),
       |prm AS (SELECT tm, th, tm $dv 5 AS ann_b, tm - (tm $dv 5) AS main_b
       |  FROM tot),
       |wg AS (SELECT source, main_mass, head_mass,
       |    CAST(floor(sqrt(CAST(main_mass AS DOUBLE))) AS BIGINT) AS wgt
       |  FROM $bbRel),
       |wt AS (SELECT ${big("sum(wgt)")} AS tw FROM wg),
       |ma AS (SELECT source, main_mass AS mass,
       |    ${ExactMath.mulDiv("p.main_b", "wg.wgt", "wt.tw", duck)} AS fl,
       |    ${ExactMath.mulMod("p.main_b", "wg.wgt", "wt.tw", duck)} AS rem,
       |    p.main_b AS budget
       |  FROM wg CROSS JOIN wt CROSS JOIN prm p),
       |mr AS (SELECT source, mass, fl, rem, budget,
       |    row_number() OVER (ORDER BY rem DESC, source) AS rk FROM ma),
       |mneed AS (SELECT max(budget) - ${big("sum(fl)")} AS extra FROM ma),
       |aa AS (SELECT source, head_mass AS mass,
       |    ${ExactMath.mulDiv("p.ann_b", "wg.head_mass", "p.th", duck)} AS fl,
       |    ${ExactMath.mulMod("p.ann_b", "wg.head_mass", "p.th", duck)} AS rem,
       |    p.ann_b AS budget
       |  FROM wg CROSS JOIN prm p),
       |ar AS (SELECT source, mass, fl, rem, budget,
       |    row_number() OVER (ORDER BY rem DESC, source) AS rk FROM aa),
       |aneed AS (SELECT max(budget) - ${big("sum(fl)")} AS extra FROM aa)
       |SELECT phase, source, mass, alloc FROM (
       |  SELECT 'main' AS phase, source, mass,
       |    fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS alloc
       |  FROM mr CROSS JOIN mneed
       |  UNION ALL
       |  SELECT 'anneal' AS phase, source, mass,
       |    fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS alloc
       |  FROM ar CROSS JOIN aneed) u
       |ORDER BY phase, source""".stripMargin
  }

  val p22Oracle: String =
    TextAnalytics.perplexityLabSql("documents", duck = true) + """,
       |bb AS (SELECT source,
       |    CAST(sum(n_bigrams) AS BIGINT) AS main_mass,
       |    CAST(sum(CASE WHEN bucket = 1 THEN n_bigrams ELSE 0 END)
       |      AS BIGINT) AS head_mass
       |  FROM lab WHERE bucket <= 2 GROUP BY source),
       |""".stripMargin + p22ScheduleCtes("bb", duck = true)

  /** p23 — DATA-CONSTRAINED REPETITION ALLOCATOR (Muennighoff et al.
    * 2023, arXiv:2305.16264): when the token DEMAND (here 2× the corpus)
    * exceeds what a temperature-balanced mix can supply from unique
    * tokens, sources must be REPEATED — and repeated epochs decay in
    * value. Per source: unique mass U, a Hamilton allocation of the
    * global demand by p15's α = 0.5 weights staged as w = ⌊√U⌋, a 4-epoch
    * repetition cap (the paper's "repeating beyond ~4 epochs is worth
    * ~zero" finding, one greedy round — surplus is REPORTED, not
    * silently re-apportioned), and the EFFECTIVE token yield under
    * geometric half-decay per epoch (e-th view worth 2^{1−e}), staged
    * exactly in q20 fixed point: f full epochs + partial r give
    * eff·2²⁰ = U·(2²¹ − 2²¹/2^f) + r·(2²⁰/2^f), every division exact
    * for f ≤ 4.
    *
    * EVERY multiply-then-divide here is staged (s21's overflow lesson,
    * applied BEFORE the gate catches it — ADVICE r12 tightened the eff
    * and util legs this round):
    *  - apportionment: ⌊B·w/tw⌋ = (B div tw)·w + ((B mod tw)·w) div tw
    *    (exact — B = q·tw+r telescopes), largest intermediate
    *    (B mod tw)·w < tw·w ≈ Σ√U·√U: safe past 10¹³ corpus tokens
    *    where the naive B·w wraps near 2.7×10¹².
    *  - eff: the naive U·2²¹ wraps at U ≈ 4.4×10¹² per source, so both
    *    products are limb-split against the 2²⁰ divisor:
    *    (U·A + r·B) div 2²⁰ = (U div 2²⁰)·A + (r div 2²⁰)·B +
    *    ((U mod 2²⁰)·A + (r mod 2²⁰)·B) div 2²⁰ (exact — both quotient
    *    terms factor out 2²⁰); intermediates < 2⁴², quotient terms
    *    ≤ 2U → safe to U ≈ 2.3×10¹⁸.
    *  - util_ppm: eff·10⁶ wraps at eff ≈ 9.2×10¹², and mulDiv's limb
    *    envelope needs c = capped < 2⁴³, so instead the CONSTANT splits:
    *    ⌊eff·10⁶/c⌋ = ⌊(eff·1000)·1000/c⌋ = (x div c)·1000 +
    *    ((x mod c)·1000) div c with x = eff·1000 (exact — x = q·c+r
    *    telescopes); intermediates < max(eff, capped)·1000 → safe to
    *    U ≈ 2.3×10¹⁵ per source. Spark (non-ANSI) wraps SILENTLY where
    *    DuckDB raises, so past these bounds the engine would be wrong
    *    without the gate noticing — hence the staging, not just a note.
    *
    * Scale shape: ONE corpus-sized partial+final fold to |sources| rows
    * (identical aggregate subplans → ReuseExchange, p21's shape);
    * everything after — windows included — runs on ≤ |sources| rows. */
  def p23RepetitionAlloc(s: SparkSession, d: String): DataFrame =
    Views.sql(s, documents(s, d), "graft_docs_p23_v",
      """WITH m AS (SELECT source, sum(size(split(text, ' '))) AS u
        |    FROM graft_docs_p23_v GROUP BY source),
        |t AS (SELECT 2 * sum(u) AS b,
        |    sum(CAST(floor(sqrt(u)) AS BIGINT)) AS tw FROM m),
        |h AS (SELECT source, u, b, tw,
        |    (b div tw) * w + ((b % tw) * w) div tw AS fl,
        |    ((b % tw) * w) % tw AS rem
        |  FROM (SELECT source, u, CAST(floor(sqrt(u)) AS BIGINT) AS w,
        |      t.b, t.tw FROM m CROSS JOIN t)),
        |r AS (SELECT source, u, fl, rem,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk FROM h),
        |need AS (SELECT max(b) - sum(fl) AS extra FROM h),
        |c AS (SELECT source, u,
        |    fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS alloc
        |  FROM r CROSS JOIN need),
        |e AS (SELECT source, u, alloc, least(alloc, 4 * u) AS capped,
        |    alloc - least(alloc, 4 * u) AS surplus,
        |    CASE WHEN u = 0 THEN 0L ELSE least(alloc, 4 * u) div u END AS f,
        |    CASE WHEN u = 0 THEN 0L ELSE least(alloc, 4 * u) % u END AS pr
        |  FROM c),
        |ab AS (SELECT pe.*, 2097152 - 2097152 div p2 AS av,
        |    1048576 div p2 AS bv
        |  FROM (SELECT e.*, CASE f WHEN 0 THEN 1L WHEN 1 THEN 2L
        |      WHEN 2 THEN 4L WHEN 3 THEN 8L ELSE 16L END AS p2 FROM e) pe),
        |q AS (SELECT source, u, alloc, capped, surplus, f,
        |    (u div 1048576) * av + (pr div 1048576) * bv
        |      + ((u % 1048576) * av + (pr % 1048576) * bv) div 1048576
        |      AS eff
        |  FROM ab)
        |SELECT source, u AS u_tokens, alloc AS alloc_tokens,
        |  capped AS capped_tokens, surplus AS surplus_tokens,
        |  f AS full_epochs, eff AS eff_tokens,
        |  CASE WHEN capped = 0 THEN 0L
        |       ELSE ((eff * 1000) div capped) * 1000
        |            + (((eff * 1000) % capped) * 1000) div capped
        |  END AS util_ppm
        |FROM q ORDER BY source""".stripMargin)

  /** p23 oracle — the identical staged chain (`//` floor division,
    * HUGEINT sums cast at the edges). */
  val p23Oracle: String =
    """WITH m AS (SELECT source,
      |      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS u
      |    FROM documents GROUP BY source),
      |t AS (SELECT CAST(2 * sum(u) AS BIGINT) AS b,
      |    CAST(sum(CAST(floor(sqrt(u)) AS BIGINT)) AS BIGINT) AS tw FROM m),
      |h AS (SELECT source, u, b, tw,
      |    (b // tw) * w + ((b % tw) * w) // tw AS fl,
      |    ((b % tw) * w) % tw AS rem
      |  FROM (SELECT source, u, CAST(floor(sqrt(u)) AS BIGINT) AS w,
      |      t.b, t.tw FROM m CROSS JOIN t)),
      |r AS (SELECT source, u, fl, rem,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk FROM h),
      |need AS (SELECT CAST(max(b) - sum(fl) AS BIGINT) AS extra FROM h),
      |c AS (SELECT source, u,
      |    fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS alloc
      |  FROM r CROSS JOIN need),
      |e AS (SELECT source, u, alloc, least(alloc, 4 * u) AS capped,
      |    alloc - least(alloc, 4 * u) AS surplus,
      |    CASE WHEN u = 0 THEN 0 ELSE least(alloc, 4 * u) // u END AS f,
      |    CASE WHEN u = 0 THEN 0 ELSE least(alloc, 4 * u) % u END AS pr
      |  FROM c),
      |ab AS (SELECT pe.*, 2097152 - 2097152 // p2 AS av,
      |    1048576 // p2 AS bv
      |  FROM (SELECT e.*, CASE f WHEN 0 THEN 1 WHEN 1 THEN 2
      |      WHEN 2 THEN 4 WHEN 3 THEN 8 ELSE 16 END AS p2 FROM e) pe),
      |q AS (SELECT source, u, alloc, capped, surplus, f,
      |    (u // 1048576) * av + (pr // 1048576) * bv
      |      + ((u % 1048576) * av + (pr % 1048576) * bv) // 1048576
      |      AS eff
      |  FROM ab)
      |SELECT source, u AS u_tokens, CAST(alloc AS BIGINT) AS alloc_tokens,
      |  CAST(capped AS BIGINT) AS capped_tokens,
      |  CAST(surplus AS BIGINT) AS surplus_tokens,
      |  CAST(f AS BIGINT) AS full_epochs, CAST(eff AS BIGINT) AS eff_tokens,
      |  CAST(CASE WHEN capped = 0 THEN 0
      |       ELSE ((eff * 1000) // capped) * 1000
      |            + (((eff * 1000) % capped) * 1000) // capped
      |  END AS BIGINT) AS util_ppm
      |FROM q ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p23_repetition_alloc" ->
      ((s: SparkSession, d: String) => p23RepetitionAlloc(s, d)),
    "p22_curriculum_schedule" -> ((s: SparkSession, d: String) => p22CurriculumSchedule(s, d)),
    "p21_token_budget_alloc" -> ((s: SparkSession, d: String) => p21TokenBudgetAlloc(s, d)),
    "p20_pretrain_pipeline" -> (p20PretrainPipeline _),
    "p19_winsorize" -> (p19Winsorize _),
    "p16_epoch_order" -> (p16EpochOrder _),
    "p15_temperature_mix" -> (p15TemperatureMix _),
    "p14_global_rank" -> (p14GlobalRank _),
    "p13_quality_funnel" -> (p13QualityFunnel _),
    "p12_overlap_chunks" -> (p12OverlapChunks _),
    "p11_pack_sequences" -> (p11PackSequences _),
    "p10_split" -> (p10Split _),
    "p17_leakage_safe_split" -> (p17LeakageSafeSplit _),
    "p18_split_leakage_audit" -> (p18SplitLeakageAudit _),
    "p9_source_cap" -> ((s: SparkSession, d: String) => p9SourceCap(s, d)),
    "p8_interval_join" -> ((s: SparkSession, d: String) => p8IntervalJoin(s, d)),
    "p7_weighted_sample" -> (p7WeightedSample _),
    "p6_mixture_rebalance" -> (p6MixtureRebalance _),
    "p1_asof_attribution" -> (p1AsofAttribution _),
    "p2_stratified_sample" -> (p2StratifiedSample _),
    "p3_token_chunks" -> (p3TokenChunks _),
    "p4_redact" -> (p4Redact _),
    "p5_quality_pipeline" -> (p5QualityPipeline _)
  )

  val oracles: Map[String, String] = Map(
    "p23_repetition_alloc" -> p23Oracle,
    "p22_curriculum_schedule" -> p22Oracle,
    "p21_token_budget_alloc" -> p21Oracle,
    "p20_pretrain_pipeline" -> p20Oracle,
    "p19_winsorize" -> p19Oracle,
    "p16_epoch_order" -> p16Oracle,
    "p15_temperature_mix" -> p15Oracle,
    "p14_global_rank" -> p14Oracle,
    "p13_quality_funnel" -> p13Oracle,
    "p12_overlap_chunks" -> p12Oracle,
    "p11_pack_sequences" -> p11Oracle,
    "p10_split" -> p10Oracle,
    "p17_leakage_safe_split" -> p17Oracle,
    "p18_split_leakage_audit" -> p18Oracle,
    "p9_source_cap" -> p9Oracle,
    "p8_interval_join" -> p8Oracle,
    "p7_weighted_sample" -> p7Oracle,
    "p6_mixture_rebalance" -> p6Oracle,
    "p1_asof_attribution" -> p1Oracle,
    "p2_stratified_sample" -> p2Oracle,
    "p3_token_chunks" -> p3Oracle,
    "p4_redact" -> p4Oracle,
    "p5_quality_pipeline" -> p5Oracle
  )
}
