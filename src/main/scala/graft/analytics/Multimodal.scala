package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The DECODE step is a STUB — this container has no image/audio codecs, so
  * [[StubMediaDecoder]] produces a deterministic fake (byte histogram) where
  * a real deployment would plug a codec. Everything around it — the schema,
  * the typed Dataset path, per-partition batching via `mapPartitions`, the
  * frame-sample explode — is the real Spark plumbing and is tested.
  *
  * The media table is derived deterministically from `documents` (payload =
  * UTF-8 bytes of the text, kind = doc_id mod 3), so the non-stub operators
  * are oracle-checkable against SQL over `documents`.
  *
  * Scale: per-row/per-partition only — no shuffle until the explicit
  * aggregations; payloads never serialize through the driver.
  */
object Multimodal {

  import Tables._

  final case class Media(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      histogram: Array[Double] // 16-bin byte-value histogram (the stubbed "decode")
  )

  /** Decoder boundary. A production impl wraps actual codecs; the stub is
    * deterministic so tests and rows-only checks are stable. */
  trait MediaDecoder extends Serializable {
    def decode(media: Media): MediaFeatures
  }

  /** STUB: "features" = normalized 16-bin histogram of payload bytes —
    * stands in for pixel/spectrogram features (no codecs in this env). */
  object StubMediaDecoder extends MediaDecoder {
    override def decode(m: Media): MediaFeatures = {
      val bins = new Array[Double](16)
      var i = 0
      while (i < m.payload.length) {
        bins((m.payload(i) & 0xFF) >> 4) += 1.0
        i += 1
      }
      val n = math.max(1, m.payload.length).toDouble
      var b = 0
      while (b < 16) { bins(b) /= n; b += 1 }
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, bins)
    }
  }

  /** The synthetic media table (documents → binary payload + typed meta). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      (pmod(col("n_chars"), lit(640)) + 64).cast("int").as("width"),
      (pmod(col("n_chars") * 7, lit(480)) + 48).cast("int").as("height"),
      (col("n_chars") * 40).as("duration_ms"))

  /** m1 — typed-metadata rollup (oracle over documents). */
  def mediaStats(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        max(col("width")).cast("long").as("max_width"),
        sum(col("duration_ms")).cast("long").as("total_duration_ms"))
      .orderBy(col("kind"))

  val mediaStatsOracle: String =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |count(*) AS n_items,
      |CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |CAST(max(n_chars % 640 + 64) AS BIGINT) AS max_width,
      |CAST(sum(n_chars * 40) AS BIGINT) AS total_duration_ms
      |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin

  /** m2 — feature extraction through the decoder boundary: typed Dataset →
    * mapPartitions (per-partition batch, executor-side) → features.
    * Stub-backed → registered rows-only. */
  def mediaFeatures(s: SparkSession, d: String,
      decoder: MediaDecoder = StubMediaDecoder): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] = mediaTable(s, d).as[Media]
    media.mapPartitions(_.map(decoder.decode))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(element_at(col("histogram"), 8), 6).as("bin7"))
      .orderBy(col("media_id"))
  }

  /** m3 — frame sampling: one row per sampled frame of each video payload,
    * frame = contiguous byte slice (the real op would seek keyframes).
    * Deterministic → oracle over documents. */
  def frameSample(s: SparkSession, d: String, maxFrames: Int = 8): DataFrame = {
    val m = mediaTable(s, d).filter(col("kind") === "video")
      .withColumn("n_frames",
        least(lit(maxFrames), greatest(lit(1L), col("duration_ms") / 1000L)).cast("long"))
    m.select(col("media_id"), col("n_frames"), length(col("payload")).as("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_bytes", floor(col("n_bytes") / col("n_frames")).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("frame_bytes"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val frameSampleOracle: String =
    """WITH v AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
      |  least(8, greatest(1, (n_chars * 40) // 1000)) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT media_id, frame_idx, n_bytes // n_frames AS frame_bytes
      |FROM v, unnest(generate_series(0, n_frames - 1)) AS t(frame_idx)
      |ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_stats" -> (mediaStats _),
    "m2_media_features" -> ((s: SparkSession, d: String) => mediaFeatures(s, d)),
    "m3_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d))
  )

  /** m2 omitted: stub-decoder output (rows-only check). */
  val oracles: Map[String, String] = Map(
    "m1_media_stats" -> mediaStatsOracle,
    "m3_frame_sample" -> frameSampleOracle
  )
}
