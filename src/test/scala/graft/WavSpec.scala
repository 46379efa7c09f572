package graft

import graft.operators.{Multimodal, Png, Wav}

/** The from-scratch RIFF/WAVE PCM codec behind the multimodal seam
  * (lossless — any sample sequence roundtrips bit-exactly, the contract
  * m_wav_decode's arithmetic oracle relies on), plus the structural
  * concatenated-PNG frame sampler. */
class WavSpec extends SparkTestBase {
  import spark.implicits._

  test("PCM16 roundtrips bit-exactly, mono and stereo") {
    for (id <- 0L until 40L) {
      val channels = (1 + id % 2).toInt
      val frames = (8 + id % 9).toInt
      val samples = Array.tabulate[Short](frames * channels)(i =>
        (((id * 31 + i * 7) % 65536) - 32768).toShort)
      val wav = Wav.encodePcm16(8000, channels, samples)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      val dec = Wav.decode(wav)
      assert(dec.sampleRate == 8000 && dec.channels == channels &&
        dec.nFrames == frames)
      assert(dec.samples.sameElements(samples), s"id=$id samples differ")
    }
  }

  test("full 16-bit range survives, including Short.MinValue/MaxValue") {
    val samples = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue, 12345)
    val dec = Wav.decode(Wav.encodePcm16(44100, 2, samples))
    assert(dec.samples.sameElements(samples) && dec.nFrames == 3)
  }

  test("unknown chunks are skipped via declared length (spec-required)") {
    val base = Wav.encodePcm16(8000, 1, Array[Short](5, -5, 100))
    // splice a LIST chunk (odd length → pad byte) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(fmtEnd) ++ junk ++ base.drop(fmtEnd)
    // RIFF size field is not used for the chunk walk; decode must succeed
    val dec = Wav.decode(spliced)
    assert(dec.samples.sameElements(Array[Short](5, -5, 100)))
  }

  test("malformed payloads fail loudly, never mis-read") {
    intercept[IllegalArgumentException](Wav.decode("not a wav at all".getBytes))
    intercept[IllegalArgumentException](Wav.decode(Array[Byte](1, 2, 3)))
    // data chunk declaring more bytes than remain
    val truncated = Wav.encodePcm16(8000, 1, Array[Short](1, 2, 3, 4)).dropRight(4)
    intercept[IllegalArgumentException](Wav.decode(truncated))
  }

  test("decodeFeatures dispatches audio/wav: frames, channels, unsigned sum") {
    val samples = Array[Short](-32768, 0, 32767, 100) // unsigned: 0, 32768, 65535, 32868
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, "audio/wav", Wav.encodePcm16(16000, 2, samples))))
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length == 1)
    val f = out.head
    assert(f.width == 2 && f.height == 2) // 2 frames × 2 channels
    assert(f.pixel_sum == 0L + 32768L + 65535L + 32868L)
  }

  test("audioFeatures: per-channel windows, exact energy + zero crossings") {
    // stereo, 7 frames, window 3 → windows of 3/3/1 frames per channel.
    // channel 0 alternates sign every frame (2 flips per full window);
    // channel 1 is constant-positive (0 flips).
    val ch0 = Array[Short](100, -200, 300, -400, 500, -600, 700)
    val ch1 = Array[Short](10, 20, 30, 40, 50, 60, 70)
    val interleaved = (0 until 7).flatMap(f => Seq(ch0(f), ch1(f))).toArray
    val media = Seq(Multimodal.MediaRow(9L, "audio/wav",
      Wav.encodePcm16(8000, 2, interleaved))).toDS()
    val got = Multimodal.audioFeatures(media, windowFrames = 3)
      .collect().map(a => (a.channel, a.window) ->
        ((a.n_frames, a.abs_sum, a.zero_crossings))).toMap
    assert(got((0, 0)) == ((3L, 600L, 2L)))   // 100+200+300, +/-/+
    assert(got((0, 1)) == ((3L, 1500L, 2L)))  // 400+500+600, -/+/-
    assert(got((0, 2)) == ((1L, 700L, 0L)))   // single frame: no pair
    assert(got((1, 0)) == ((3L, 60L, 0L)))
    assert(got((1, 1)) == ((3L, 150L, 0L)))
    assert(got((1, 2)) == ((1L, 70L, 0L)))
    assert(got.size == 6)
  }

  test("decimateAudio keeps every stride-th frame with interleaving intact") {
    val ch0 = Array[Short](100, -200, 300, -400, 500, -600, 700)
    val ch1 = Array[Short](10, 20, 30, 40, 50, 60, 70)
    val interleaved = (0 until 7).flatMap(f => Seq(ch0(f), ch1(f))).toArray
    val media = Seq(Multimodal.MediaRow(4L, "audio/wav",
      Wav.encodePcm16(16000, 2, interleaved))).toDS()
    val out = Multimodal.decimateAudio(media, stride = 2).collect().head
    val dec = Wav.decode(out.payload)
    // frames 0, 2, 4, 6 survive; channels stay paired; rate halves
    assert(dec.nFrames == 4 && dec.channels == 2 && dec.sampleRate == 8000)
    assert(dec.samples.toSeq == Seq[Short](100, 10, 300, 30, 500, 50, 700, 70))
    // stride 1 is the identity round-trip
    val same = Multimodal.decimateAudio(media, stride = 1).collect().head
    assert(Wav.decode(same.payload).samples.toSeq == interleaved.toSeq)
  }

  test("sampleFramesPng splits structurally and decodes every k-th frame") {
    // three frames; the middle frame's PIXELS carry the PNG signature byte
    // pattern (deflate may or may not keep it literal in the stream —
    // either way, splitting must come from the chunk walk, never a scan)
    val sig = Png.Signature.map(b => (b & 0xff))
    def frame(v: Int, w: Int, h: Int) =
      Png.encodeGray(w, h, (x, y) => sig((x + y * w) % sig.length) ^ v)
    val payload = frame(0, 4, 3) ++ frame(1, 5, 2) ++ frame(2, 3, 3)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video/png-stream", payload)))
    val out = Multimodal.sampleFramesPng(media, every = 2)
      .collect().sortBy(_.frame_no)
    assert(out.map(_.frame_no).toSeq == Seq(0, 2))
    assert(out(0).width == 4 && out(0).height == 3)
    assert(out(1).width == 3 && out(1).height == 3)
    val expect0 = (0 until 12).map(i => sig(i % sig.length) ^ 0).sum
    val expect2 = (0 until 9).map(i => sig(i % sig.length) ^ 2).sum
    assert(out(0).pixel_sum == expect0 && out(1).pixel_sum == expect2)
  }

  test("sampleFramesPng rejects a truncated trailing frame loudly") {
    val good = Png.encodeGray(4, 4, (x, y) => x + y)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video/png-stream", good ++ good.take(20))))
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.sampleFramesPng(media, every = 1).collect())
    assert(ex.getMessage != null)
  }
}
