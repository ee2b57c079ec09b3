package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The DECODE step is REAL: payloads for m2 are binary PPM (P6) images —
  * the simplest uncompressed raster format, parseable without codec
  * libraries — and [[PpmDecoder]] is a complete spec-conformant parser
  * (magic, comment/whitespace handling, header ints, raw interleaved RGB).
  * A production deployment swaps in a JPEG/PNG/audio decoder behind the
  * same [[MediaDecoder]] boundary; the Spark plumbing around it — typed
  * Dataset, per-partition batching via `mapPartitions`, schema — is
  * format-independent.
  *
  * The media tables are derived deterministically from `documents`
  * (pixel bytes = a cycle of `md5(text)` hex chars; kind = doc_id mod 3),
  * so even the decoded pixel statistics are oracle-checkable: DuckDB
  * re-derives the pixel stream from `md5(text)` and must reproduce the
  * decoder's channel means exactly.
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

  /** Decoded raster features: dimensions from the HEADER (not the metadata
    * columns) plus exact per-channel sums — means are derived in the plan so
    * the rounding stays inside Catalyst. */
  final case class MediaFeatures(
      media_id: Long,
      width: Long,
      height: Long,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long
  )

  /** Decoder boundary. [[PpmDecoder]] is the built-in raster impl; a
    * production deployment plugs codec-backed decoders here. */
  trait MediaDecoder extends Serializable {
    def decode(media: Media): MediaFeatures
  }

  /** Binary PPM (P6) parser: `P6 <ws> width <ws> height <ws> maxval
    * <single ws> <raw RGB triples>`, where any whitespace run may contain
    * `#`-to-end-of-line comments. Rejects anything malformed — this is a
    * real parser, not a stub keyed to the generator. */
  object PpmDecoder extends MediaDecoder {
    /** Parses the P6 header and validates raster length; returns
      * (width, height, offset of the first raster byte). */
    private[analytics] def parseHeader(mediaId: Long, bytes: Array[Byte]): (Int, Int, Int) = {
      var pos = 0
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"media $mediaId: bad PPM — $msg")
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
      // whitespace run, where '#' starts a comment running to end-of-line
      def skipWs(): Unit = {
        var more = true
        while (more && pos < bytes.length) {
          if (isWs(bytes(pos))) pos += 1
          else if (bytes(pos) == '#')
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else more = false
        }
      }
      def readInt(): Int = {
        skipWs()
        if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9')
          fail(s"expected integer at offset $pos")
        var v = 0
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("magic != P6")
      pos = 2
      val w = readInt()
      val h = readInt()
      val maxval = readInt()
      if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
      // exactly ONE whitespace byte separates the header from pixel data
      if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing raster separator")
      pos += 1
      if (bytes.length - pos < w.toLong * h * 3)
        fail(s"truncated raster (${bytes.length - pos} < ${w.toLong * h * 3})")
      (w, h, pos)
    }

    override def decode(m: Media): MediaFeatures = {
      val bytes = m.payload
      val (w, h, start) = parseHeader(m.media_id, bytes)
      val nPx = w.toLong * h
      var r = 0L; var g = 0L; var b = 0L
      var i = 0L
      while (i < nPx) {
        val off = start + (i * 3).toInt
        r += bytes(off) & 0xFF
        g += bytes(off + 1) & 0xFF
        b += bytes(off + 2) & 0xFF
        i += 1
      }
      MediaFeatures(m.media_id, w.toLong, h.toLong, nPx, r, g, b)
    }
  }

  /** Output of the m4 resample: target dims + exact per-channel sums over
    * the sampled pixels (integers only — nothing to round). */
  final case class ResizedFeatures(
      media_id: Long,
      out_w: Long,
      out_h: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long
  )

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

  private val ppmW = 15
  private val ppmH = 11

  /** PPM image table: every document rendered as a 15×11 binary PPM whose
    * pixel bytes cycle through the 32 lowercase-hex chars of `md5(text)` —
    * deterministic, ASCII-only, and re-derivable in SQL. 495 = 15·11·3 is
    * coprime-ish with the 32-char cycle (495 mod 32 = 15) and 3 ∤ 32, so the
    * three channels sample DIFFERENT residues and get distinct means — a
    * decoder that misdeinterleaves channels fails the oracle. */
  def ppmTable(s: SparkSession, d: String): DataFrame = {
    val nPixelBytes = ppmW * ppmH * 3 // 495
    val repeats = nPixelBytes / 32 + 1
    documents(s, d).select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(concat(lit(s"P6\n$ppmW $ppmH\n255\n"),
        substring(repeat(md5(encode(col("text"), "UTF-8")), repeats), 1, nPixelBytes)),
        "UTF-8").as("payload"),
      lit("image/x-portable-pixmap").as("mime"),
      lit(ppmW).as("width"),
      lit(ppmH).as("height"),
      lit(0L).as("duration_ms"))
  }

  /** m2 — feature extraction through the decoder boundary: typed Dataset →
    * mapPartitions (per-partition batch, executor-side) → parsed header dims
    * + per-channel pixel means. Fully oracle-checked: DuckDB re-derives the
    * raster from `md5(text)` and recomputes the channel means. */
  def mediaFeatures(s: SparkSession, d: String,
      decoder: MediaDecoder = PpmDecoder): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] = ppmTable(s, d).as[Media]
    media.mapPartitions(_.map(decoder.decode))
      .select(col("media_id"), col("width"), col("height"), col("n_pixels"),
        round(col("sum_r") / col("n_pixels"), 6).as("mean_r"),
        round(col("sum_g") / col("n_pixels"), 6).as("mean_g"),
        round(col("sum_b") / col("n_pixels"), 6).as("mean_b"))
      .orderBy(col("media_id"))
  }

  /** The oracle rebuilds the pixel stream independently: byte i of the
    * raster is the ASCII code of hex char (i mod 32) of md5(text), channel
    * = i mod 3. Means can never tie at the round-half boundary: the channel
    * sum is an integer and sum·10⁶/165 is exactly half-integral only if
    * 33 | sum, in which case it is even — so HALF_UP (Spark) and HALF_EVEN
    * agree and the 6-decimal rounding is engine-portable. */
  val mediaFeaturesOracle: String =
    """WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
      |px AS (SELECT media_id, CAST(i AS INT) AS i,
      |         unicode(substr(h, (CAST(i AS INT) % 32) + 1, 1)) AS b
      |       FROM m, unnest(generate_series(0, 494)) AS t(i))
      |SELECT media_id, CAST(15 AS BIGINT) AS width, CAST(11 AS BIGINT) AS height,
      |  CAST(165 AS BIGINT) AS n_pixels,
      |  round(sum(CASE WHEN i % 3 = 0 THEN b END) / 165.0, 6) AS mean_r,
      |  round(sum(CASE WHEN i % 3 = 1 THEN b END) / 165.0, 6) AS mean_g,
      |  round(sum(CASE WHEN i % 3 = 2 THEN b END) / 165.0, 6) AS mean_b
      |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin

  /** m4 — RESIZE through the decoder boundary: nearest-neighbor downsample
    * of each decoded raster to 5×4 (source pixel (⌊x·w/5⌋, ⌊y·h/4⌋) — the
    * standard index mapping), emitting exact per-channel sums over the 20
    * sampled pixels. This is the image-preprocessing step of a multimodal
    * training pipeline (thumbnail/patch extraction) run where it must run:
    * executor-side, per partition, downstream of the same [[MediaDecoder]]
    * seam as m2 — a production codec+resampler (bilinear, antialiased)
    * replaces the kernel, not the plumbing.
    *
    * Scale shape: narrow scan → mapPartitions → sort; payload bytes never
    * shuffle (the output is 6 longs per image). */
  def resizeNearest(s: SparkSession, d: String, outW: Int = 5, outH: Int = 4): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] = ppmTable(s, d).as[Media]
    media.mapPartitions(_.map { m =>
      val bytes = m.payload
      val (w, h, start) = PpmDecoder.parseHeader(m.media_id, bytes)
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          val sx = x * w / outW
          val off = start + (sy * w + sx) * 3
          r += bytes(off) & 0xFF
          g += bytes(off + 1) & 0xFF
          b += bytes(off + 2) & 0xFF
          x += 1
        }
        y += 1
      }
      ResizedFeatures(m.media_id, outW.toLong, outH.toLong, r, g, b)
    }).toDF().orderBy(col("media_id"))
  }

  /** m4 oracle — DuckDB rebuilds the raster from `md5(text)` (the m2
    * derivation), maps byte index i → (x, y, channel), and keeps exactly
    * the nearest-neighbor sample grid: x ∈ {0,3,6,9,12} (= ⌊x'·15/5⌋),
    * y ∈ {0,2,5,8} (= ⌊y'·11/4⌋). */
  val resizeNearestOracle: String =
    """WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
      |px AS (SELECT media_id, CAST(i AS INT) AS i,
      |         unicode(substr(h, (CAST(i AS INT) % 32) + 1, 1)) AS b
      |       FROM m, unnest(generate_series(0, 494)) AS t(i)),
      |s AS (SELECT media_id, b, (i // 3) // 15 AS y, (i // 3) % 15 AS x, i % 3 AS c FROM px)
      |SELECT media_id, CAST(5 AS BIGINT) AS out_w, CAST(4 AS BIGINT) AS out_h,
      |  CAST(sum(CASE WHEN c = 0 THEN b END) AS BIGINT) AS sum_r,
      |  CAST(sum(CASE WHEN c = 1 THEN b END) AS BIGINT) AS sum_g,
      |  CAST(sum(CASE WHEN c = 2 THEN b END) AS BIGINT) AS sum_b
      |FROM s WHERE x % 3 = 0 AND y IN (0, 2, 5, 8)
      |GROUP BY media_id ORDER BY media_id""".stripMargin

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

  /** Output of the m5 windowing: exact integer sum-of-squares per window
    * (RMS without the root — monotone in it, and nothing to round). */
  final case class AudioWindows(
      media_id: Long,
      window_idx: Long,
      n_samples: Long,
      energy: Long
  )

  /** m5 — AUDIO FRAME ENERGY through the decoder boundary: each `audio`
    * payload's bytes are treated as 8-bit PCM samples, split into tumbling
    * 16-sample windows, and each window emits its exact sum-of-squares
    * energy — the framing step of an audio feature pipeline (VAD, silence
    * trimming, loudness stats). Unlike m2/m4's one-row-per-item decode,
    * this is the 1→N expansion (`flatMap` inside `mapPartitions`): one
    * payload yields O(len/16) frame rows, all computed executor-side; a
    * production codec (WAV/FLAC → PCM) replaces the byte interpretation
    * at the same seam.
    *
    * Scale shape: narrow scan → mapPartitions flatMap → sort; payload
    * bytes never shuffle, frame rows are 4 longs each. */
  def audioEnergy(s: SparkSession, d: String, win: Int = 16): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] =
      mediaTable(s, d).filter(col("kind") === "audio").as[Media]
    media.mapPartitions(_.flatMap { m =>
      val bytes = m.payload
      (0 until bytes.length by win).iterator.map { off =>
        val end = math.min(off + win, bytes.length)
        var e = 0L
        var i = off
        while (i < end) {
          val v = (bytes(i) & 0xFF).toLong
          e += v * v
          i += 1
        }
        AudioWindows(m.media_id, (off / win).toLong, (end - off).toLong, e)
      }
    }).toDF().orderBy(col("media_id"), col("window_idx"))
  }

  /** m5 oracle — the payload is the UTF-8 encoding of ASCII text, so byte
    * i equals the code point of character i+1; DuckDB windows the
    * character stream and sums squares exactly. */
  val audioEnergyOracle: String =
    """WITH a AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1),
      |px AS (SELECT media_id, CAST(i AS BIGINT) AS i,
      |    CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) AS b
      |  FROM a, unnest(generate_series(0, length(text) - 1)) AS t(i))
      |SELECT media_id, i // 16 AS window_idx, count(*) AS n_samples,
      |  CAST(sum(b * b) AS BIGINT) AS energy
      |FROM px GROUP BY media_id, i // 16
      |ORDER BY media_id, window_idx""".stripMargin

  /** Packed 62-bit average-hash signature (media_id, sig). */
  final case class MediaSignature(media_id: Long, sig: Long)

  /** Average-hash (aHash) raster signature through the real parser: bit i
    * (first 62 pixels, raster order) is set iff pixel i's gray value
    * exceeds the image mean — compared as `n·gray_i > Σgray` (integer
    * cross-multiplication, no division, no float), so the packed BIGINT
    * is bit-identical in any engine. 62 bits keeps the value inside a
    * signed long. */
  private[analytics] def aHash(media: Media): MediaSignature = {
    val (w, h, off) = PpmDecoder.parseHeader(media.media_id, media.payload)
    val n = w * h
    val gray = new Array[Long](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val p = off + i * 3
      val g = (media.payload(p) & 0xff).toLong +
        (media.payload(p + 1) & 0xff) + (media.payload(p + 2) & 0xff)
      gray(i) = g; total += g; i += 1
    }
    var sig = 0L
    var b = 0
    val nb = math.min(62, n)
    while (b < nb) {
      if (n.toLong * gray(b) > total) sig |= 1L << b
      b += 1
    }
    MediaSignature(media.media_id, sig)
  }

  /** m6 — PERCEPTUAL-HASH MEDIA DEDUP: the multimodal member of the dedup
    * family. Every raster gets a decode-side aHash signature and dedup is
    * d1's hash-groupBy applied to it — the corpus is doubled (media_id
    * shift, the d1 convention) so every image has exactly one duplicate
    * and the operator's effect is observable. Exact-signature grouping is
    * the degenerate (Hamming 0) case; a production near-dup (Hamming ≤ k)
    * reuses n3's SimHash banding machinery on this same signature — the
    * seam, not a new algorithm.
    *
    * Scale shape: decode + signature run executor-side per partition
    * (mapPartitions through the [[MediaDecoder]] parser); only the
    * (8-byte sig, id) pair ever crosses the shuffle — payloads never
    * move. Oracle: DuckDB re-derives every pixel from md5(text), the
    * gray totals, the cross-multiplied bit tests, and the packed BIGINT. */
  def phashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = ppmTable(s, d)
    val doubled = base.unionByName(
      base.withColumn("media_id", col("media_id") + 1000000L)).as[Media]
    doubled.mapPartitions(_.map(aHash))
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("sig"))
      .orderBy(col("keep_id"))
  }

  val phashDedupOracle: String =
    """WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
      |dup AS (SELECT media_id, h FROM m
      |        UNION ALL SELECT media_id + 1000000, h FROM m),
      |g AS (SELECT media_id, CAST(i AS INT) AS i,
      |        unicode(substr(h, ((3 * CAST(i AS INT)) % 32) + 1, 1))
      |      + unicode(substr(h, ((3 * CAST(i AS INT) + 1) % 32) + 1, 1))
      |      + unicode(substr(h, ((3 * CAST(i AS INT) + 2) % 32) + 1, 1)) AS gray
      |      FROM dup, unnest(generate_series(0, 164)) AS t(i)),
      |tot AS (SELECT media_id, CAST(sum(gray) AS BIGINT) AS total
      |        FROM g GROUP BY 1),
      |sg AS (SELECT g.media_id,
      |        CAST(sum(CASE WHEN g.i < 62 AND 165 * g.gray > tot.total
      |                      THEN (CAST(1 AS BIGINT) << g.i) ELSE 0 END) AS BIGINT) AS sig
      |       FROM g JOIN tot USING (media_id) GROUP BY 1)
      |SELECT min(media_id) AS keep_id, count(*) AS n_copies, sig
      |FROM sg GROUP BY sig ORDER BY keep_id""".stripMargin

  /** Per-frame decoded luminance sum (exact integer — nothing to round). */
  final case class FrameLuma(media_id: Long, frame_idx: Long, luma: Long)

  /** m7 — SCENE-CHANGE DETECTION: the shot-boundary step of a video
    * training pipeline (sample one clip/caption per scene, not per fixed
    * interval). Frames are m3's contiguous byte slices; each frame's
    * "luma" is its exact byte sum (a production decoder substitutes real
    * per-frame luminance at the same seam), and a cut fires where the
    * frame-over-frame change exceeds 25% — compared as
    * 4·|luma_f − luma_{f−1}| > (luma_f + luma_{f−1}), integer
    * cross-multiplication, no division, no float, so the verdict is
    * bit-identical in any engine.
    *
    * Scale shape: narrow scan → mapPartitions (1→n_frames rows of 3 longs;
    * payload bytes never shuffle) → ONE lag window partitioned by media_id
    * (frames-per-video is bounded by maxFrames, so partitions are tiny and
    * uniform) → partial+final per-video aggregation. */
  def sceneChange(s: SparkSession, d: String, maxFrames: Int = 8): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] =
      mediaTable(s, d).filter(col("kind") === "video").as[Media]
    val frames = media.mapPartitions(_.flatMap { m =>
      val nf = math.min(maxFrames.toLong, math.max(1L, m.duration_ms / 1000L)).toInt
      val fb = m.payload.length / nf
      (0 until nf).iterator.map { f =>
        var sum = 0L
        var i = f * fb
        val end = (f + 1) * fb
        while (i < end) {
          sum += (m.payload(i) & 0xFF).toLong
          i += 1
        }
        FrameLuma(m.media_id, f.toLong, sum)
      }
    }).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames.withColumn("prev", lag(col("luma"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          abs(col("luma") - col("prev")) * 4 > (col("luma") + col("prev")), 1L)
          .otherwise(0L))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("cut")).as("n_cuts"),
        coalesce(min(when(col("cut") === 1L, col("frame_idx"))), lit(-1L))
          .as("first_cut"))
      .orderBy(col("media_id"))
  }

  /** m7 oracle — the payload is ASCII text (the m5 contract: byte i = code
    * point of char i+1), so DuckDB re-derives every frame's byte sum from
    * character positions, replays the lag + cross-multiplied threshold,
    * and LEFT-joins the frame skeleton so zero-length frames (fb = 0)
    * keep their luma-0 rows exactly as the decoder emits them. */
  val sceneChangeOracle: String =
    """WITH v AS (SELECT doc_id AS media_id, text,
      |    octet_length(encode(text)) AS n_bytes,
      |    least(8, greatest(1, (n_chars * 40) // 1000)) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (SELECT media_id, frame_idx, n_bytes // n_frames AS fb, text
      |  FROM v, unnest(generate_series(0, n_frames - 1)) t(frame_idx)),
      |ps AS (SELECT media_id, frame_idx,
      |    CAST(sum(unicode(substr(text, CAST(frame_idx * fb + i + 1 AS INT), 1)))
      |      AS BIGINT) AS luma
      |  FROM fr, unnest(generate_series(0, fb - 1)) u(i)
      |  GROUP BY media_id, frame_idx),
      |fl AS (SELECT fr.media_id, fr.frame_idx, coalesce(ps.luma, 0) AS luma
      |  FROM fr LEFT JOIN ps
      |    ON fr.media_id = ps.media_id AND fr.frame_idx = ps.frame_idx),
      |lg AS (SELECT media_id, frame_idx, luma,
      |    lag(luma) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev
      |  FROM fl),
      |c AS (SELECT media_id, frame_idx,
      |    CASE WHEN prev IS NOT NULL AND abs(luma - prev) * 4 > (luma + prev)
      |      THEN 1 ELSE 0 END AS cut
      |  FROM lg)
      |SELECT media_id, count(*) AS n_frames, CAST(sum(cut) AS BIGINT) AS n_cuts,
      |  CAST(coalesce(min(CASE WHEN cut = 1 THEN frame_idx END), -1) AS BIGINT)
      |    AS first_cut
      |FROM c GROUP BY media_id ORDER BY media_id""".stripMargin

  /** m8 — VOICED-SEGMENT EXTRACTION (the VAD / silence-trimming step of
    * an audio training pipeline): m5's tumbling energy windows, a window
    * is "voiced" iff its energy is STRICTLY above its clip's mean —
    * compared as energy · n_windows > Σ energy, integer
    * cross-multiplication, no division — and consecutive voiced windows
    * fold into segments via gaps-and-islands (s2's discipline:
    * window_idx − row_number is constant within a run). Per clip:
    * segment count, longest segment, voiced-window total — what a real
    * pipeline uses to trim silence and reject dead audio. Clips with no
    * above-mean window (constant-energy) drop out in both engines.
    *
    * Scale shape: the energy table is m5's executor-side decode (payload
    * bytes never shuffle); the mean is a per-clip partial+final
    * aggregation joined back on media_id; the islands window partitions
    * by media_id with O(len/16) rows per clip — tiny and uniform. */
  def voicedSegments(s: SparkSession, d: String, win: Int = 16): DataFrame = {
    val aw = audioEnergy(s, d, win)
    val tot = aw.groupBy(col("media_id"))
      .agg(sum(col("energy")).as("tote"), count(lit(1)).as("nw"))
    val voiced = aw.join(tot, "media_id")
      .filter(col("energy") * col("nw") > col("tote"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("window_idx"))
    voiced
      .withColumn("grp", col("window_idx") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(count(lit(1)).as("seg_len"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_segments"),
        max(col("seg_len")).as("max_seg"),
        sum(col("seg_len")).as("n_voiced"))
      .orderBy(col("media_id"))
  }

  /** m8 oracle — the m5 byte-window derivation as a CTE, then the same
    * cross-multiplied threshold and islands fold in SQL. */
  val voicedSegmentsOracle: String =
    """WITH a AS (SELECT doc_id AS media_id, text FROM documents
      |  WHERE doc_id % 3 = 1),
      |px AS (SELECT media_id, CAST(i AS BIGINT) AS i,
      |    CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) AS b
      |  FROM a, unnest(generate_series(0, length(text) - 1)) AS t(i)),
      |aw AS (SELECT media_id, i // 16 AS window_idx,
      |    CAST(sum(b * b) AS BIGINT) AS energy
      |  FROM px GROUP BY media_id, i // 16),
      |tot AS (SELECT media_id, CAST(sum(energy) AS BIGINT) AS tote,
      |    count(*) AS nw FROM aw GROUP BY media_id),
      |v AS (SELECT aw.media_id, aw.window_idx FROM aw JOIN tot USING (media_id)
      |  WHERE aw.energy * tot.nw > tot.tote),
      |g AS (SELECT media_id, window_idx,
      |    window_idx - row_number() OVER (PARTITION BY media_id
      |      ORDER BY window_idx) AS grp
      |  FROM v),
      |seg AS (SELECT media_id, grp, count(*) AS seg_len
      |  FROM g GROUP BY media_id, grp)
      |SELECT media_id, count(*) AS n_segments,
      |  CAST(max(seg_len) AS BIGINT) AS max_seg,
      |  CAST(sum(seg_len) AS BIGINT) AS n_voiced
      |FROM seg GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Per-video ordered frame-signature fingerprint (m9). */
  final case class VideoPrint(media_id: Long, n_frames: Long, fp: String)

  /** m9 — VIDEO FINGERPRINT DEDUP: cross-video duplicate detection by
    * per-frame perceptual signatures — the video member of the dedup
    * family (d1 text hashes, m6 image aHash). Each video is m3/m7's
    * frame slicing; each frame gets m6's aHash discipline applied to its
    * bytes (bit b set iff byte b clears the frame mean, compared as
    * fb·byte > Σframe — integer cross-multiplication, 62 bits max), and
    * the video's fingerprint is the '_'-joined signature sequence IN
    * FRAME ORDER (re-encoded or re-containerized copies of the same
    * content collide; videos differing in any frame don't). Dedup is
    * d1's hash-groupBy on (n_frames, fp); the corpus is doubled (the
    * m6/d1 convention) so every video has exactly one duplicate.
    *
    * Scale shape: decode + per-frame signatures run executor-side per
    * partition (payload bytes never shuffle); only (media_id, n_frames,
    * fp) rows — ≤ 8 signatures' worth of digits — cross the exchange,
    * and the groupBy is partial+final on the fingerprint key. A
    * production pipeline swaps real keyframe luma planes in at the same
    * [[MediaDecoder]] seam; near-dup (Hamming ≤ k per frame) reuses n3's
    * banding on the same signatures. */
  def videoDedup(s: SparkSession, d: String, maxFrames: Int = 8): DataFrame = {
    import s.implicits._
    val base = mediaTable(s, d).filter(col("kind") === "video")
    val doubled = base.unionByName(
      base.withColumn("media_id", col("media_id") + 1000000L)).as[Media]
    doubled.mapPartitions(_.map { m =>
      val nf = math.min(maxFrames.toLong, math.max(1L, m.duration_ms / 1000L)).toInt
      val fb = m.payload.length / nf
      val sb = new StringBuilder
      var f = 0
      while (f < nf) {
        var fsum = 0L
        var i = f * fb
        while (i < (f + 1) * fb) { fsum += (m.payload(i) & 0xFF).toLong; i += 1 }
        var sig = 0L
        var b = 0
        val nb = math.min(62, fb)
        while (b < nb) {
          if (fb.toLong * (m.payload(f * fb + b) & 0xFF) > fsum) sig |= 1L << b
          b += 1
        }
        if (f > 0) sb.append('_')
        sb.append(sig)
        f += 1
      }
      VideoPrint(m.media_id, nf.toLong, sb.toString)
    }).toDF()
      .groupBy(col("n_frames"), col("fp"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("n_frames"), col("fp"))
      .orderBy(col("keep_id"))
  }

  /** m9 oracle — DuckDB re-derives every frame's byte sum and the
    * cross-multiplied 62-bit signature from character positions (the
    * m5/m7 ASCII contract), keeps zero-length frames as signature 0 via
    * the LEFT-JOIN skeleton (m7's fl trick), orders the string_agg by
    * frame_idx, and replays the doubled-corpus groupBy. */
  val videoDedupOracle: String =
    """WITH v AS (SELECT doc_id AS media_id, text,
      |    octet_length(encode(text)) AS n_bytes,
      |    least(8, greatest(1, (n_chars * 40) // 1000)) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |dup AS (SELECT media_id, text, n_bytes, n_frames FROM v
      |        UNION ALL SELECT media_id + 1000000, text, n_bytes, n_frames FROM v),
      |fr AS (SELECT media_id, frame_idx, n_bytes // n_frames AS fb, text, n_frames
      |  FROM dup, unnest(generate_series(0, n_frames - 1)) t(frame_idx)),
      |tot AS (SELECT media_id, frame_idx,
      |    CAST(sum(unicode(substr(text, CAST(frame_idx * fb + i + 1 AS INT), 1)))
      |      AS BIGINT) AS fsum
      |  FROM fr, unnest(generate_series(0, fb - 1)) u(i)
      |  GROUP BY media_id, frame_idx),
      |sigb AS (SELECT z.media_id, z.frame_idx,
      |    CAST(sum(CASE WHEN z.fb * z.ub > z.fsum
      |      THEN (CAST(1 AS BIGINT) << z.b) ELSE 0 END) AS BIGINT) AS sig
      |  FROM (SELECT fr.media_id, fr.frame_idx, fr.fb, t2.fsum, w.b,
      |          CAST(unicode(substr(fr.text,
      |            CAST(fr.frame_idx * fr.fb + w.b + 1 AS INT), 1)) AS BIGINT) AS ub
      |        FROM fr JOIN tot t2 USING (media_id, frame_idx),
      |             unnest(generate_series(0, least(62, fb) - 1)) w(b)) z
      |  GROUP BY z.media_id, z.frame_idx),
      |sk AS (SELECT fr.media_id, fr.frame_idx, fr.n_frames,
      |    coalesce(sigb.sig, 0) AS sig
      |  FROM fr LEFT JOIN sigb USING (media_id, frame_idx)),
      |fp AS (SELECT media_id, CAST(max(n_frames) AS BIGINT) AS n_frames,
      |    string_agg(CAST(sig AS VARCHAR), '_' ORDER BY frame_idx) AS fp
      |  FROM sk GROUP BY media_id)
      |SELECT min(media_id) AS keep_id, count(*) AS n_copies, n_frames, fp
      |FROM fp GROUP BY n_frames, fp ORDER BY keep_id""".stripMargin

  /** Per-audio energy-delta fingerprint (m10). */
  final case class AudioPrint(media_id: Long, n_windows: Long, fp: Long)

  /** m10 — AUDIO FINGERPRINT DEDUP: cross-audio duplicate detection by a
    * temporal energy-delta signature — the audio member of the dedup
    * family, completing it across every modality (d1 text, m6 image,
    * m9 video, m10 audio). Each clip is m5's 16-byte energy windows;
    * bit w of the fingerprint (first 62 deltas) is set iff window w+1's
    * energy EXCEEDS window w's — the sign-of-band-energy-difference
    * scheme of Haitsma & Kalker 2002 (the classic robust audio
    * fingerprint), reduced to one band and exact integers. Re-encoded
    * copies of the same signal collide; any local energy reordering
    * flips a bit. Dedup is d1's hash-groupBy on (n_windows, fp); the
    * corpus is doubled (the m6/m9/d1 convention) so every clip has
    * exactly one duplicate.
    *
    * Scale shape: decode + windowed energies + the delta-sign pack run
    * executor-side per partition (payload bytes never shuffle); only
    * (media_id, n_windows, fp) — 3 longs — crosses the exchange, and
    * the groupBy is partial+final on the fingerprint key. Near-dup
    * (Hamming ≤ k) reuses n3's banding on the same 62-bit signatures. */
  def audioDedup(s: SparkSession, d: String, win: Int = 16): DataFrame = {
    import s.implicits._
    val base = mediaTable(s, d).filter(col("kind") === "audio")
    val doubled = base.unionByName(
      base.withColumn("media_id", col("media_id") + 1000000L)).as[Media]
    doubled.mapPartitions(_.map { m =>
      val bytes = m.payload
      val nWin = (bytes.length + win - 1) / win
      val e = new Array[Long](math.max(1, nWin))
      var i = 0
      while (i < bytes.length) {
        val v = (bytes(i) & 0xFF).toLong
        e(i / win) += v * v
        i += 1
      }
      var fp = 0L
      var w = 0
      val nb = math.min(62, nWin - 1)
      while (w < nb) {
        if (e(w + 1) > e(w)) fp |= 1L << w
        w += 1
      }
      AudioPrint(m.media_id, nWin.toLong, fp)
    }).toDF()
      .groupBy(col("n_windows"), col("fp"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("n_windows"), col("fp"))
      .orderBy(col("keep_id"))
  }

  /** m10 oracle — DuckDB re-derives the windowed energies from character
    * positions (the m5 ASCII contract), the lead()-compared delta signs,
    * the packed BIGINT, and the doubled-corpus groupBy; window counts
    * come from byte length so zero-length clips keep fingerprint 0. */
  val audioDedupOracle: String =
    """WITH a AS (SELECT doc_id AS media_id, text FROM documents
      |           WHERE doc_id % 3 = 1),
      |dup AS (SELECT media_id, text FROM a
      |        UNION ALL SELECT media_id + 1000000, text FROM a),
      |px AS (SELECT media_id, CAST(i AS BIGINT) AS i,
      |    CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) AS b
      |  FROM dup, unnest(generate_series(0, length(text) - 1)) AS t(i)),
      |en AS (SELECT media_id, i // 16 AS w, CAST(sum(b * b) AS BIGINT) AS e
      |  FROM px GROUP BY media_id, i // 16),
      |dl AS (SELECT media_id, w, e,
      |    lead(e) OVER (PARTITION BY media_id ORDER BY w) AS e2 FROM en),
      |fpx AS (SELECT media_id,
      |    CAST(sum(CASE WHEN e2 > e
      |      THEN (CAST(1 AS BIGINT) << CAST(w AS INT)) ELSE 0 END) AS BIGINT)
      |      AS fp
      |  FROM dl WHERE e2 IS NOT NULL AND w < 62 GROUP BY media_id),
      |nw AS (SELECT media_id,
      |    CAST((octet_length(encode(text)) + 15) // 16 AS BIGINT)
      |      AS n_windows
      |  FROM dup)
      |SELECT min(media_id) AS keep_id, count(*) AS n_copies, n_windows, fp
      |FROM (SELECT nw.media_id, nw.n_windows, coalesce(fpx.fp, 0) AS fp
      |      FROM nw LEFT JOIN fpx USING (media_id)) z
      |GROUP BY n_windows, fp ORDER BY keep_id""".stripMargin

  /** Cut-frame row for m11's video leg: byte offset of a scene-change
    * frame (exact integers all the way). */
  final case class CutFrame(media_id: Long, frame_idx: Long, frame_off: Long)

  /** Audio-track window row for m11's audio leg: byte offset + exact
    * sum-of-squares energy (m5's windowing rule). */
  final case class TrackWindow(media_id: Long, window_idx: Long, woff: Long,
      energy: Long)

  /** m11 — CROSS-MODAL AS-OF ALIGNMENT (scene cuts → audio windows): the
    * A/V synchronization step of a video training pipeline — every scene
    * boundary (m7's cut rule) binds to the LAST audio feature window
    * starting at or before it on the shared media timeline, which is how
    * clip/caption builders attach audio context (and how subtitle and
    * ASR alignment work) when the two modalities are sampled at
    * different rates. The video's byte stream carries both derivations:
    * frames are m3/m7's contiguous slices, the audio track is m5's
    * 16-byte tumbling energy windows over the same payload — a real
    * demuxer feeds two PTS-stamped streams into the identical join at
    * this seam. First-visible rule: a window starting exactly AT the cut
    * offset wins (ASOF `>=`, p1's tie discipline).
    *
    * Boundary rule: m7's shape (integer cross-multiplied relative
    * change, no division, no float) at 2% sensitivity — 50·|Δluma| >
    * Σluma — because the alignment operator's job is to bind EVERY
    * detected boundary, and this corpus's text-derived frames never
    * reach m7's 25% shot-cut threshold (the byte sums of prose are too
    * homogeneous); a real decoder swaps thresholds at the same seam.
    *
    * Scale shape: both legs decode executor-side (payload bytes never
    * shuffle; cut rows are 3 longs, window rows 4); the as-of join is
    * p1's union + running-last window merge — ONE shuffle on media_id,
    * per-media sort bounded by maxFrames + len/16 rows, no quadratic
    * term. Output is all-BIGINT (offsets, gap, energy), so the hash is
    * float-free. */
  def avAlign(s: SparkSession, d: String, maxFrames: Int = 8,
      win: Int = 16): DataFrame = {
    import s.implicits._
    val media: Dataset[Media] =
      mediaTable(s, d).filter(col("kind") === "video").as[Media]
    // leg 1: scene-change frames (m7's derivation, keeping byte offsets)
    val cuts = media.mapPartitions(_.flatMap { m =>
      val nf = math.min(maxFrames.toLong, math.max(1L, m.duration_ms / 1000L)).toInt
      val fb = m.payload.length / nf
      var prev = -1L
      (0 until nf).iterator.flatMap { f =>
        var sum = 0L
        var i = f * fb
        val end = (f + 1) * fb
        while (i < end) { sum += (m.payload(i) & 0xFF).toLong; i += 1 }
        val isCut = prev >= 0L && math.abs(sum - prev) * 50 > (sum + prev)
        prev = sum
        if (isCut) Iterator.single(CutFrame(m.media_id, f.toLong, f.toLong * fb))
        else Iterator.empty
      }
    }).toDF()
    // leg 2: the audio track — m5's tumbling windows over the same payload
    val windows = media.mapPartitions(_.flatMap { m =>
      (0 until m.payload.length by win).iterator.map { off =>
        val end = math.min(off + win, m.payload.length)
        var e = 0L
        var i = off
        while (i < end) {
          val v = (m.payload(i) & 0xFF).toLong
          e += v * v
          i += 1
        }
        TrackWindow(m.media_id, (off / win).toLong, off.toLong, e)
      }
    }).toDF()
    // p1's as-of merge: side 0 = window (visible at equal offsets), 1 = cut
    val tagged = windows.select(col("media_id"), col("woff").as("off"),
        lit(0).as("side"), col("window_idx"), col("energy"),
        lit(null).cast("long").as("frame_idx"))
      .unionByName(cuts.select(col("media_id"), col("frame_off").as("off"),
        lit(1).as("side"), lit(null).cast("long").as("window_idx"),
        lit(null).cast("long").as("energy"), col("frame_idx")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id"))
      .orderBy(col("off"), col("side"), col("window_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    tagged
      .withColumn("aw", last(col("window_idx"), ignoreNulls = true).over(w))
      .withColumn("aoff",
        last(when(col("side") === 0, col("off")), ignoreNulls = true).over(w))
      .withColumn("aenergy", last(col("energy"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("aw").isNotNull)
      .select(col("media_id"), col("frame_idx"), col("off").as("frame_off"),
        col("aw").as("window_idx"), (col("off") - col("aoff")).as("align_gap"),
        col("aenergy").as("energy"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** m11 oracle — m7's cut derivation (carrying the frame byte offset) +
    * m5's windowed energies over the same character stream, joined with
    * DuckDB's native ASOF `>=` (p1's oracle discipline). */
  val avAlignOracle: String =
    """WITH v AS (SELECT doc_id AS media_id, text,
      |    octet_length(encode(text)) AS n_bytes,
      |    least(8, greatest(1, (n_chars * 40) // 1000)) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (SELECT media_id, frame_idx, n_bytes // n_frames AS fb, text
      |  FROM v, unnest(generate_series(0, n_frames - 1)) t(frame_idx)),
      |ps AS (SELECT media_id, frame_idx,
      |    CAST(sum(unicode(substr(text, CAST(frame_idx * fb + i + 1 AS INT), 1)))
      |      AS BIGINT) AS luma
      |  FROM fr, unnest(generate_series(0, fb - 1)) u(i)
      |  GROUP BY media_id, frame_idx),
      |fl AS (SELECT fr.media_id, fr.frame_idx, fr.fb, coalesce(ps.luma, 0) AS luma
      |  FROM fr LEFT JOIN ps
      |    ON fr.media_id = ps.media_id AND fr.frame_idx = ps.frame_idx),
      |lg AS (SELECT media_id, frame_idx, fb, luma,
      |    lag(luma) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev
      |  FROM fl),
      |cuts AS (SELECT media_id, frame_idx,
      |    CAST(frame_idx * fb AS BIGINT) AS frame_off
      |  FROM lg WHERE prev IS NOT NULL AND abs(luma - prev) * 50 > (luma + prev)),
      |px AS (SELECT media_id, CAST(i AS BIGINT) AS i,
      |    CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) AS b
      |  FROM v, unnest(generate_series(0, n_bytes - 1)) t(i)),
      |w AS (SELECT media_id, i // 16 AS window_idx,
      |    CAST((i // 16) * 16 AS BIGINT) AS woff,
      |    CAST(sum(b * b) AS BIGINT) AS energy
      |  FROM px GROUP BY media_id, i // 16)
      |SELECT c.media_id, c.frame_idx, c.frame_off, w.window_idx,
      |  c.frame_off - w.woff AS align_gap, w.energy
      |FROM cuts c ASOF JOIN w
      |  ON c.media_id = w.media_id AND c.frame_off >= w.woff
      |ORDER BY c.media_id, c.frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m11_av_align" -> ((s: SparkSession, d: String) => avAlign(s, d)),
    "m10_audio_dedup" -> ((s: SparkSession, d: String) => audioDedup(s, d)),
    "m9_video_dedup" -> ((s: SparkSession, d: String) => videoDedup(s, d)),
    "m8_voiced_segments" -> ((s: SparkSession, d: String) => voicedSegments(s, d)),
    "m7_scene_change" -> ((s: SparkSession, d: String) => sceneChange(s, d)),
    "m6_phash_dedup" -> (phashDedup _),
    "m5_audio_energy" -> ((s: SparkSession, d: String) => audioEnergy(s, d)),
    "m1_media_stats" -> (mediaStats _),
    "m2_media_features" -> ((s: SparkSession, d: String) => mediaFeatures(s, d)),
    "m3_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d)),
    "m4_resize" -> ((s: SparkSession, d: String) => resizeNearest(s, d))
  )

  val oracles: Map[String, String] = Map(
    "m11_av_align" -> avAlignOracle,
    "m10_audio_dedup" -> audioDedupOracle,
    "m9_video_dedup" -> videoDedupOracle,
    "m8_voiced_segments" -> voicedSegmentsOracle,
    "m7_scene_change" -> sceneChangeOracle,
    "m6_phash_dedup" -> phashDedupOracle,
    "m5_audio_energy" -> audioEnergyOracle,
    "m1_media_stats" -> mediaStatsOracle,
    "m2_media_features" -> mediaFeaturesOracle,
    "m3_frame_sample" -> frameSampleOracle,
    "m4_resize" -> resizeNearestOracle
  )
}
