package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact dedup here; the near-dup
  * family (MinHash LSH, SimHash, n-gram Jaccard) lives in [[NearDup]].
  *
  * Scale design (the 100 TB rule): dedup never shuffles full document text.
  * Rows are pre-hashed (`xxhash64` — codegen'd Catalyst expression) and the
  * shuffle key is the 8-byte hash, not the document. The oracle checks
  * semantics by grouping on the normalized text itself — identical output
  * absent 64-bit collisions.
  */
object Dedup {

  import Tables._

  /** Whitespace-collapse + lowercase normalization prior to hashing —
    * standard exact-dedup canonicalization for a pretraining corpus. */
  private val normText = regexp_replace(lower(col("text")), "\\s+", " ")

  /** The corpus has no exact duplicates at any SF, so the dedup queries run
    * on the corpus unioned with a doc_id-shifted copy of itself: every text
    * then has exactly one duplicate — the operator's effect is observable
    * and oracle-checkable. */
  private def withDupes(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** Exact dedup, hash-grouped: groupBy xxhash64(norm_text) → keep the min
    * doc_id per group. Only (hash, doc_id) pairs cross the shuffle. */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    withDupes(s, d)
      .select(xxhash64(normText).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  val exactDedupOracle: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM (SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS nt
      |      FROM (SELECT doc_id, text FROM documents
      |            UNION ALL SELECT doc_id + 1000000, text FROM documents))
      |GROUP BY nt ORDER BY keep_id""".stripMargin

  /** Dedup survivor count — the usual "how much did dedup remove" statistic.
    * One pass, one partial+final aggregate; distinct-count runs on the 8-byte
    * hash, never the text. */
  def dedupStats(s: SparkSession, d: String): DataFrame =
    withDupes(s, d)
      .select(xxhash64(normText).as("h"))
      .agg(count(lit(1)).as("n_total"), countDistinct(col("h")).as("n_kept"))
      .withColumn("n_removed", col("n_total") - col("n_kept"))

  val dedupStatsOracle: String =
    """SELECT count(*) AS n_total, count(DISTINCT nt) AS n_kept,
      |count(*) - count(DISTINCT nt) AS n_removed
      |FROM (SELECT regexp_replace(lower(text), '\s+', ' ', 'g') AS nt
      |      FROM (SELECT text FROM documents UNION ALL SELECT text FROM documents))""".stripMargin

  /** Streaming exact dedup: `dropDuplicatesWithinWatermark` keyed on the
    * content hash — the state store holds only keys seen within the
    * watermark horizon, so state is BOUNDED (a plain streaming
    * `dropDuplicates` grows forever — the 100 TB disqualifier). Use for
    * continuous ingest dedup; the batch variant above is the backfill
    * path. `df` must carry an event-time column named by `tsCol`. */
  def streamingDedup(df: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    df.withColumn("h", xxhash64(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")
      .drop("h")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> (exactDedup _),
    "d2_dedup_stats" -> (dedupStats _)
  )

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" -> exactDedupOracle,
    "d2_dedup_stats" -> dedupStatsOracle
  )
}
