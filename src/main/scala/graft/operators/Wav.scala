package graft.operators

/** A REAL decoder for the audio container (the third genuine codec
  * next to [[Ppm]] and [[Bmp]]): RIFF/WAVE with 16-bit integer PCM —
  * chunked container walk ("fmt " before "data", unknown chunks
  * SKIPPED by their declared size, the part naive parsers get wrong),
  * little-endian fields, interleaved signed 16-bit samples. PCM is
  * raw samples after the headers — deterministic, no entropy coding —
  * so audio feature extraction joins the oracle-gateable family
  * through the same shared-formula discipline as the image codecs.
  *
  * Scale note: one forward pass per payload, batch-invoked from
  * mapPartitions; embarrassingly parallel, shuffles nothing.
  */
object Wav {

  /** Parsed PCM audio; `data` aliases the payload, samples start at
    * `dataOffset`, little-endian int16, channel-interleaved.
    */
  final case class Audio(sampleRate: Int, channels: Int, nFrames: Int,
      data: Array[Byte], dataOffset: Int)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE payload; None outside the supported envelope
    * (bad magic, missing/short fmt, audioFormat ≠ 1 (PCM),
    * bitsPerSample ≠ 16, channels < 1, zero/odd-sized or truncated
    * data chunk, or a chunk walk that runs off the payload). Chunks
    * other than fmt/data are skipped by declared size (word-aligned,
    * per RIFF: odd-sized chunks carry a pad byte).
    */
  def parse(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var haveFmt = false
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val sz = i32(bytes, pos + 4)
      // Long arithmetic: a declared size near Int.MaxValue would wrap
      // `pos + 8 + sz` negative and slip past an Int-typed guard.
      if (sz < 0 || pos.toLong + 8L + sz.toLong > bytes.length.toLong) return None
      val body = pos + 8
      if (id == "fmt ") {
        if (sz < 16) return None
        val audioFormat = u16(bytes, body)
        channels = u16(bytes, body + 2)
        sampleRate = i32(bytes, body + 4)
        val bps = u16(bytes, body + 14)
        if (audioFormat != 1 || bps != 16 || channels < 1 || sampleRate < 1)
          return None
        haveFmt = true
      } else if (id == "data") {
        if (!haveFmt) return None // fmt must precede data
        if (sz == 0 || sz % (2 * channels) != 0) return None
        return Some(Audio(sampleRate, channels, sz / (2 * channels), bytes, body))
      }
      pos = body + sz + (sz & 1) // RIFF word alignment: odd chunks pad
    }
    None
  }

  /** Signed 16-bit sample at frame f, channel c. */
  def sample(a: Audio, f: Int, c: Int): Int = {
    val off = a.dataOffset + 2 * (f * a.channels + c)
    ((a.data(off) & 0xff) | (a.data(off + 1) << 8)).toShort.toInt
  }

  /** First-channel feature row: exact integer Σ|s| and Σs² plus the
    * strict zero-crossing count (s_{i-1}·s_i < 0) — the silence/energy
    * /spectral-proxy trio an audio curation filter bins on, all
    * integer-exact so the oracle re-derives them from the payload
    * formula with no float divergence.
    */
  def features(a: Audio): (Long, Long, Long) = {
    var sumAbs = 0L
    var sumSq = 0L
    var zc = 0L
    var prev = 0
    var f = 0
    while (f < a.nFrames) {
      val s = sample(a, f, 0)
      sumAbs += math.abs(s)
      sumSq += s.toLong * s
      if (f > 0 && prev.toLong * s < 0) zc += 1
      prev = s
      f += 1
    }
    (sumAbs, sumSq, zc)
  }
}
