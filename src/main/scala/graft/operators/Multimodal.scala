package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, and batched per-partition decode/feature
  * extraction.
  *
  * Three REAL codecs sit behind the seam: [[Png]] (from-scratch zlib +
  * scanline filters), [[Jpeg]] (pure-JDK imageio), [[Wav]] (from-scratch
  * RIFF/PCM) — plus real integer box-average resize and structural
  * concatenated-PNG frame sampling. Only kinds with no offline codec
  * (true AV containers) fall back to a clearly-marked deterministic STUB;
  * the Spark-side plumbing is identical either way: schema, typed
  * Dataset, one decoder instance per partition (the batched-UDF seam the
  * reference exposes as its pluggable per-row-group function,
  * overturemaestro/_parquet_multiprocessing.py:136-146).
  */
object Multimodal {

  case class MediaRow(id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, pixel_sum: Long,
                           features: Array[Float])

  final val FeatureDim = 8

  /** STUB decoder — stands in for a real image/audio codec. Deterministic
    * from the payload bytes so tests are stable: "dimensions" from a byte
    * hash, "features" from a rolling sum per stripe. A real deployment
    * swaps ONLY this function (signature: whole-payload → features). */
  def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L
    payload.foreach(b => h = h * 31 + (b & 0xff))
    val width = 16 + math.floorMod(h, 240).toInt
    val height = 16 + math.floorMod(h >> 8, 240).toInt
    val features = new Array[Float](FeatureDim)
    if (payload.nonEmpty) {
      payload.indices.foreach { i =>
        features(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      }
      features.indices.foreach(i => features(i) /= math.max(payload.length / FeatureDim, 1))
    }
    (width, height, features)
  }

  /** Batched decode: one decoder instance per partition, streaming over
    * the rows (the mapPartitions seam — no per-row setup, no driver
    * round-trip). Dispatch on `kind`: `image/png` payloads go through the
    * REAL from-scratch codec ([[Png.decode]] — chunk walk, zlib inflate,
    * all five scanline filters); `image/jpeg` through the REAL pure-JDK
    * codec ([[Jpeg.decode]] via javax.imageio); other kinds use the
    * deterministic stub (no audio/video libraries in this container).
    * `pixel_sum` and the stripe
    * features come from the reconstructed pixels for PNG, from the
    * payload bytes for the stub. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder initialization goes here
      rows.map { r =>
        if (r.kind == "image/png") {
          val dec = Png.decode(r.payload)
          val (sum, f) = byteStats(dec.pixels)
          MediaFeatures(r.id, r.kind, r.payload.length, dec.width, dec.height, sum, f)
        } else if (r.kind == "image/jpeg") {
          val dec = Jpeg.decode(r.payload)
          val (sum, f) = byteStats(dec.pixels)
          MediaFeatures(r.id, r.kind, r.payload.length, dec.width, dec.height, sum, f)
        } else if (r.kind == "audio/wav") {
          // REAL audio codec ([[Wav.decode]], from-scratch RIFF walk):
          // width = frames per channel, height = channels, pixel_sum =
          // unsigned-folded sample sum (s + 32768 per 16-bit sample —
          // exact, PCM is lossless, so the oracle is pure arithmetic)
          val dec = Wav.decode(r.payload)
          var sum = 0L
          val f = new Array[Float](FeatureDim)
          var i = 0
          while (i < dec.samples.length) {
            val u = dec.samples(i) + 32768
            sum += u
            f(i % FeatureDim) += u / 65535.0f
            i += 1
          }
          if (dec.samples.nonEmpty)
            f.indices.foreach(j => f(j) /= math.max(dec.samples.length / FeatureDim, 1))
          MediaFeatures(r.id, r.kind, r.payload.length, dec.nFrames, dec.channels, sum, f)
        } else {
          val (w, h, f) = stubDecode(r.payload)
          val (sum, _) = byteStats(r.payload)
          MediaFeatures(r.id, r.kind, r.payload.length, w, h, sum, f)
        }
      }
    }
  }

  case class AudioWindow(id: Long, channel: Int, window: Int,
                         n_frames: Long, abs_sum: Long, zero_crossings: Long)

  /** Audio resampling by integer frame decimation through the real codec:
    * keep every `stride`-th FRAME (all channels of it — interleaving is
    * preserved), re-encode as PCM16 at sampleRate/stride. Nearest-neighbor
    * decimation is exact integer sample selection, so downstream decode
    * stats have pure arithmetic oracles (the 16 kHz → 8 kHz normalization
    * step of an audio curation pipeline, minus the anti-alias filter a
    * DSP library would add — the SEAM and the container round-trip are
    * the real parts). Narrow typed map, no shuffle. */
  def decimateAudio(media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(stride >= 1)
    media.map { r =>
      val dec = Wav.decode(r.payload)
      val ch = dec.channels
      val outFrames = (dec.nFrames + stride - 1) / stride
      val out = new Array[Short](outFrames * ch)
      var j = 0
      while (j < outFrames) {
        var c = 0
        while (c < ch) {
          out(j * ch + c) = dec.samples(j * stride * ch + c)
          c += 1
        }
        j += 1
      }
      MediaRow(r.id, r.kind,
        Wav.encodePcm16(math.max(1, dec.sampleRate / stride), ch, out))
    }
  }

  /** Frame-windowed audio feature extraction through the real [[Wav]]
    * codec — the "feature-extract" stage past bare decode: per
    * (payload, channel, window of `windowFrames` frames) emit the
    * EXACT-integer energy proxy Σ|sample| and the zero-crossing count
    * (sign flips between consecutive frames, both ends inside the
    * window; sign(x) = x < 0). One typed flatMap per row — bounded
    * fan-out (frames/windowFrames windows per channel), narrow, no
    * shuffle; 16-bit PCM is lossless so the oracle is pure arithmetic. */
  def audioFeatures(media: Dataset[MediaRow],
                    windowFrames: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    require(windowFrames > 0)
    media.flatMap { r =>
      val dec = Wav.decode(r.payload)
      val ch = dec.channels
      val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindow]
      var c = 0
      while (c < ch) {
        var w = 0
        while (w * windowFrames < dec.nFrames) {
          val from = w * windowFrames
          val until = math.min(from + windowFrames, dec.nFrames)
          var absSum = 0L
          var zcr = 0L
          var f = from
          while (f < until) {
            val s = dec.samples(f * ch + c).toLong
            absSum += math.abs(s)
            if (f > from) {
              val prev = dec.samples((f - 1) * ch + c).toLong
              if ((prev < 0) != (s < 0)) zcr += 1
            }
            f += 1
          }
          out += AudioWindow(r.id, c, w, until - from, absSum, zcr)
          w += 1
        }
        c += 1
      }
      out
    }
  }

  /** Unsigned-byte sum + per-stripe normalized means over `bytes`. */
  private def byteStats(bytes: Array[Byte]): (Long, Array[Float]) = {
    var sum = 0L
    val features = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      features(i % FeatureDim) += v / 255.0f
      i += 1
    }
    if (bytes.nonEmpty)
      features.indices.foreach(i => features(i) /= math.max(bytes.length / FeatureDim, 1))
    (sum, features)
  }

  case class ResizedMedia(id: Long, kind: String, width: Int, height: Int,
                          payload: Array[Byte])
  case class Frame(id: Long, frame_no: Int, offset: Int, payload: Array[Byte])

  /** Exact box-average downscale of a row-major 8-bit raster by an
    * integer `factor`: output pixel = ⌊Σ(f×f block) / f²⌋, trailing
    * rows/cols beyond the last full block dropped. Pure integer
    * arithmetic — bit-reproducible, so resized stats stay oracle-able
    * (a constant block averages to itself exactly). */
  def boxDownscale(px: Array[Byte], w: Int, h: Int, factor: Int): (Int, Int, Array[Byte]) = {
    require(factor >= 1, "factor must be >= 1")
    val (ow, oh) = (w / factor, h / factor)
    val out = new Array[Byte](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sum = 0
        var dy = 0
        while (dy < factor) {
          var dx = 0
          val base = (oy * factor + dy) * w + ox * factor
          while (dx < factor) { sum += px(base + dx) & 0xff; dx += 1 }
          dy += 1
        }
        out(oy * ow + ox) = (sum / (factor * factor)).toByte
        ox += 1
      }
      oy += 1
    }
    (ow, oh, out)
  }

  /** Image resize through the REAL codecs (round 5 — no longer a stub for
    * image kinds): `image/png` / `image/jpeg` payloads are decoded
    * ([[Png.decode]] / [[Jpeg.decode]]), box-averaged down by the integer
    * `factor`, and returned as raw 8-bit grayscale rasters. Other kinds
    * keep the deterministic byte-domain stub (no audio/video codecs in
    * this container). Same Spark shape either way: typed mapPartitions,
    * one decoder per partition, bounded output size. */
  def resizeImages(media: Dataset[MediaRow], factor: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        r.kind match {
          case "image/png" =>
            val d = Png.decode(r.payload)
            // multi-channel PNG rasters: average channels to luma first?
            // No — Png.decode returns per-channel bytes; gray inputs (the
            // fixture path) are 1 byte/px. Non-gray payloads take the
            // byte-domain path to stay shape-safe.
            if (d.pixels.length == d.width * d.height) {
              val (ow, oh, out) = boxDownscale(d.pixels, d.width, d.height, factor)
              ResizedMedia(r.id, r.kind, ow, oh, out)
            } else stubResize(r, factor)
          case "image/jpeg" =>
            val d = Jpeg.decode(r.payload)
            val (ow, oh, out) = boxDownscale(d.pixels, d.width, d.height, factor)
            ResizedMedia(r.id, r.kind, ow, oh, out)
          case _ => stubResize(r, factor)
        }
      }
    }
  }

  /** STUB resize for non-image kinds: deterministic byte-domain stride
    * sample (real deployment swaps this for an AV codec; the Spark shape
    * is the real part). */
  private def stubResize(r: MediaRow, factor: Int): ResizedMedia = {
    val stride = math.max(1, factor)
    val out = r.payload.indices.by(stride).map(r.payload).toArray
    val (w, h, _) = stubDecode(out)
    ResizedMedia(r.id, r.kind, w, h, out)
  }

  /** Back-compat byte-budget form (pre-round-5 signature, non-image path). */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val stride = math.max(1, r.payload.length / math.max(targetBytes, 1))
        val out = r.payload.indices.by(stride).map(r.payload).toArray
        val (w, h, _) = stubDecode(out)
        ResizedMedia(r.id, r.kind, w, h, out)
      }
    }
  }

  case class FrameFeatures(id: Long, frame_no: Int, width: Int, height: Int,
                           pixel_sum: Long)

  /** REAL frame sampling (round 5 — the video seam's sampling + decode are
    * no longer stubs): the payload is a concatenated-PNG stream (the
    * honest offline stand-in for a video container — no AV codecs in this
    * container, but PNG-stream formats are real: APNG/MNG lineage), split
    * STRUCTURALLY via [[Png.frameEnd]]'s chunk walk (never a byte-signature
    * scan — signatures occur inside compressed IDAT), every `every`-th
    * frame decoded through the real codec. One input row → N frame rows:
    * the flatMap batch shape a real video frame-sampler has; swapping the
    * container parser is the only change a real deployment makes. */
  def sampleFramesPng(media: Dataset[MediaRow], every: Int): Dataset[FrameFeatures] = {
    require(every >= 1, s"sampling stride must be >= 1: $every")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      new Iterator[(Int, Array[Byte])] {
        private var off = 0
        private var no = 0
        def hasNext: Boolean = off < r.payload.length
        def next(): (Int, Array[Byte]) = {
          val end = Png.frameEnd(r.payload, off)
          val out = (no, java.util.Arrays.copyOfRange(r.payload, off, end))
          off = end; no += 1
          out
        }
      }.collect { case (no, bytes) if no % every == 0 =>
        val dec = Png.decode(bytes)
        var sum = 0L
        dec.pixels.foreach(b => sum += (b & 0xff))
        FrameFeatures(r.id, no, dec.width, dec.height, sum)
      }
    }
  }

  /** STUB frame sampling: every `everyBytes`-th slice becomes a "frame"
    * row (video frame-sample analog: one input row → N frame rows, the
    * flatMap batch shape). */
  def sampleFrames(media: Dataset[MediaRow], everyBytes: Int, frameLen: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Iterator.range(0, math.max(r.payload.length, 1), math.max(everyBytes, 1))
        .zipWithIndex.map { case (off, i) =>
          Frame(r.id, i, off, r.payload.slice(off, math.min(off + frameLen, r.payload.length)))
        }
    }
  }

  /** DataFrame convenience: documents-style table → media table with the
    * text bytes standing in for a decoded payload. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("id"), lit("text/utf-8").as("kind"),
        // NULL text → empty payload: downstream decoders take the payload
        // bytes unconditionally (a null would NPE inside mapPartitions)
        coalesce(to_binary(col("text"), lit("utf-8")), lit(Array.emptyByteArray)).as("payload"))
      .as[MediaRow]
  }
}
