package graft.operators

/** From-scratch RIFF/WAVE PCM codec — the third REAL codec behind the
  * multimodal seam, next to [[Png]] (from-scratch zlib/filters) and
  * [[Jpeg]] (pure-JDK imageio). WAV container spec is public (Microsoft
  * RIFF, 1991); 16-bit PCM is lossless, so unlike JPEG no block-constant
  * trick is needed: ANY synthesized sample sequence roundtrips bit-exactly
  * and the m_wav_decode oracle is pure (doc_id, i) arithmetic.
  *
  * Scope (enough for the audio leg of a curation pipeline's decode seam):
  * canonical 44-byte header + `fmt ` / `data` chunk walk (unknown chunks
  * skipped, as the spec requires), PCM format 1, 16-bit signed
  * little-endian, 1..8 channels. Everything else fails loudly — a decode
  * seam must never silently mis-read media bytes. */
object Wav {

  case class Decoded(sampleRate: Int, channels: Int, nFrames: Int,
                     samples: Array[Short])

  /** Encode interleaved 16-bit PCM frames into a standard WAV byte array. */
  def encodePcm16(sampleRate: Int, channels: Int,
                  samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels out of range: $channels")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort)                       // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)         // byte rate
    buf.putShort((channels * 2).toShort)          // block align
    buf.putShort(16.toShort)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Decode a WAV payload: chunk walk over the RIFF body, `fmt ` parsed
    * and validated (PCM / 16-bit), `data` chunk's samples read as signed
    * little-endian 16-bit, unknown chunks (LIST, fact, cue …) skipped via
    * their declared length (+ the RIFF odd-length pad byte). */
  def decode(payload: Array[Byte]): Decoded = {
    require(payload.length >= 12, s"truncated WAV: ${payload.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    buf.getInt // declared RIFF size; data chunk bounds are checked below
    require(fourcc() == "WAVE", "not a WAVE form")

    var sampleRate = -1; var channels = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = fourcc()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"chunk '$id' declares $len bytes, ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val start = buf.position()
          val fmt = buf.getShort
          require(fmt == 1, s"unsupported WAV format code $fmt (PCM only)")
          channels = buf.getShort.toInt
          require(channels >= 1 && channels <= 8, s"bad channel count $channels")
          sampleRate = buf.getInt
          buf.getInt; buf.getShort                 // byte rate, block align
          val bits = buf.getShort
          require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
          buf.position(start + len + (len & 1))    // skip fmt extensions
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(len % 2 == 0, s"odd data length $len for 16-bit PCM")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk")
    require(samples.length % channels == 0,
      s"data length ${samples.length} not aligned to $channels channels")
    Decoded(sampleRate, channels, samples.length / channels, samples)
  }
}
