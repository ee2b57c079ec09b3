package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.analytics.Multimodal.{Media, PpmDecoder}

/** [[Multimodal.PpmDecoder]] is a real binary-PPM (P6) parser, not a stub
  * keyed to the generator — so it is tested against the FORMAT: arbitrary
  * header whitespace, `#` comments, channel deinterleaving, and malformed
  * input rejection, none of which the generated payloads exercise. */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def media(payload: Array[Byte]): Media =
    Media(7L, "image", payload, "image/x-portable-pixmap", 0, 0, 0L)

  private def ppm(header: String, pixels: Array[Int]): Array[Byte] =
    header.getBytes("UTF-8") ++ pixels.map(_.toByte)

  test("decodes a minimal P6 image with exact per-channel sums") {
    // 2x1: pixels (10,20,30) and (40,50,60) — channels must deinterleave
    val f = PpmDecoder.decode(media(ppm("P6\n2 1\n255\n", Array(10, 20, 30, 40, 50, 60))))
    f.width shouldBe 2L
    f.height shouldBe 1L
    f.n_pixels shouldBe 2L
    f.sum_r shouldBe 50L
    f.sum_g shouldBe 70L
    f.sum_b shouldBe 90L
  }

  test("handles comments, CRLF, and multi-space header whitespace") {
    val f = PpmDecoder.decode(media(
      ppm("P6 # magic\r\n  # a comment line\n 1\t2 # dims\n255 ",
        Array(255, 0, 0, 255, 0, 0))))
    f.width shouldBe 1L
    f.height shouldBe 2L
    f.sum_r shouldBe 510L
    f.sum_g shouldBe 0L
  }

  test("pixel bytes are unsigned (values > 127 do not go negative)") {
    val f = PpmDecoder.decode(media(ppm("P6\n1 1\n255\n", Array(200, 201, 202))))
    (f.sum_r, f.sum_g, f.sum_b) shouldBe ((200L, 201L, 202L))
  }

  test("rejects bad magic, truncated raster, and unsupported maxval") {
    an[IllegalArgumentException] should be thrownBy
      PpmDecoder.decode(media(ppm("P5\n1 1\n255\n", Array(1, 2, 3))))
    an[IllegalArgumentException] should be thrownBy
      PpmDecoder.decode(media(ppm("P6\n2 2\n255\n", Array(1, 2, 3)))) // 3 < 12 bytes
    an[IllegalArgumentException] should be thrownBy
      PpmDecoder.decode(media(ppm("P6\n1 1\n65535\n", Array(1, 2, 3)))) // 2-byte samples unsupported
  }

  test("property: decode inverts encode for arbitrary dims/pixels/header noise") {
    // deterministic pseudo-random cases — construct a PPM with arbitrary
    // dimensions, pixel bytes, and header whitespace/comment noise, then
    // check the decoder against an independently-computed ground truth
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256))
      val ws = () => Seq(" ", "\n", "\t", "\r\n", " # noise\n", "\n#c\n ")(rnd.nextInt(6))
      val header = s"P6${ws()}$w${ws()}$h${ws()}255\n"
      val f = PpmDecoder.decode(media(ppm(header, px)))
      f.width shouldBe w.toLong
      f.height shouldBe h.toLong
      f.n_pixels shouldBe (w * h).toLong
      f.sum_r shouldBe px.grouped(3).map(_(0).toLong).sum
      f.sum_g shouldBe px.grouped(3).map(_(1).toLong).sum
      f.sum_b shouldBe px.grouped(3).map(_(2).toLong).sum
    }
  }

  test("m4 nearest-neighbor sampling picks exactly pixels (⌊x·w/W⌋, ⌊y·h/H⌋)") {
    val s = spark; import s.implicits._
    // 4x3 image whose pixel (x, y) has channels (x, y, 10x + y): a 2x2
    // resize must sample (0,0), (2,0), (0,1), (2,1) — sy = ⌊y·3/2⌋ ∈ {0,1}
    val pixels = for {
      y <- 0 until 3; x <- 0 until 4
      c <- Seq(x, y, 10 * x + y)
    } yield c
    val df = Seq(Media(1L, "image", ppm("P6\n4 3\n255\n", pixels.toArray),
      "image/x-portable-pixmap", 0, 0, 0L)).toDS()
    val row = df.mapPartitions(_.map { m =>
      val bytes = m.payload
      val (w, h, start) = PpmDecoder.parseHeader(m.media_id, bytes)
      var r = 0L; var g = 0L; var b = 0L
      for (y <- 0 until 2; x <- 0 until 2) {
        val off = start + ((y * h / 2) * w + (x * w / 2)) * 3
        r += bytes(off) & 0xFF; g += bytes(off + 1) & 0xFF; b += bytes(off + 2) & 0xFF
      }
      (r, g, b)
    }).collect().head
    row shouldBe ((0L + 2 + 0 + 2, 0L + 0 + 1 + 1, 0L + 20 + 1 + 21))
  }

  test("m6 aHash sets exactly the above-mean bits, packed little-endian") {
    // 2x2 grays: (1,1,1)=3, (100,100,100)=300, (1,1,1)=3, (100,100,100)=300
    // total = 606, n = 4: bit i set iff 4·gray_i > 606 → bits 1 and 3
    val px = Array(1, 1, 1, 100, 100, 100, 1, 1, 1, 100, 100, 100)
    val sig = Multimodal.aHash(media(ppm("P6\n2 2\n255\n", px)))
    sig.media_id shouldBe 7L
    sig.sig shouldBe ((1L << 1) | (1L << 3))
    // uniform image: no gray strictly exceeds the mean → all bits clear
    val flat = Array.fill(12)(9)
    Multimodal.aHash(media(ppm("P6\n2 2\n255\n", flat))).sig shouldBe 0L
  }

  test("m2 decodes the generated corpus: header dims parsed, means bounded by hex-char codes") {
    val rows = Multimodal.mediaFeatures(spark, "/root/testdata/sf0.001").collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(r.fieldIndex("width")) shouldBe 15L
      r.getLong(r.fieldIndex("height")) shouldBe 11L
      r.getLong(r.fieldIndex("n_pixels")) shouldBe 165L
      // pixel bytes are ASCII codes of [0-9a-f]: '0'=48 .. 'f'=102
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val m = r.getDouble(r.fieldIndex(c))
        m should (be >= 48.0 and be <= 102.0)
      }
    }
  }
}
