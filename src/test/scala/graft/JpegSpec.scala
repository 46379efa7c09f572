package graft

import graft.operators.{Jpeg, Multimodal}

/** The pure-JDK JPEG codec behind the multimodal seam: the block-constant
  * grayscale Q100 exactness contract (what makes m_jpeg_decode's
  * arithmetic oracle valid), plus seam dispatch. */
class JpegSpec extends SparkTestBase {
  import spark.implicits._

  test("block-constant grayscale at quality 1.0 roundtrips BIT-EXACTLY") {
    // every 8×8 DCT block constant: DC-only spectrum, Q100 luma step 1,
    // no chroma path — the whole entropy/DCT pipeline must be lossless
    // here or the sum (and m_jpeg_decode) breaks
    for (id <- 0L until 60L) {
      val w = 8 * (1 + id % 3).toInt
      val h = 8 * (1 + (id * 3) % 3).toInt
      def pix(x: Int, y: Int): Int = ((id * 31 + 7 * (x / 8) + 13 * (y / 8)) % 256).toInt
      val payload = Jpeg.encodeGray(w, h, pix)
      // real JPEG container: SOI marker
      assert((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      val dec = Jpeg.decode(payload)
      assert(dec.width == w && dec.height == h)
      var i = 0
      for (y <- 0 until h; x <- 0 until w) {
        assert((dec.pixels(i) & 0xff) == pix(x, y), s"id=$id pixel ($x,$y)")
        i += 1
      }
    }
  }

  test("non-block-aligned gradient still decodes with correct dims (lossy ok)") {
    val payload = Jpeg.encodeGray(13, 9, (x, y) => (x * 17 + y * 5) % 256)
    val dec = Jpeg.decode(payload)
    assert(dec.width == 13 && dec.height == 9 && dec.pixels.length == 13 * 9)
  }

  test("decodeFeatures dispatches image/jpeg through the real codec") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image/jpeg",
        Jpeg.encodeGray(16, 8, (x, y) => ((x / 8) * 100 + 17) % 256))))
    val r = Multimodal.decodeFeatures(media).collect()(0)
    assert(r.width == 16 && r.height == 8)
    // blocks: 8×8 of 17 and 8×8 of 117 -> 64*17 + 64*117
    assert(r.pixel_sum == 64L * 17 + 64L * 117)
  }

  test("garbage payload fails loudly, not silently") {
    intercept[Exception] { Jpeg.decode(Array[Byte](1, 2, 3, 4)) }
  }
}
