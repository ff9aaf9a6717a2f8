package graft.operators

/** A REAL decoder for the first ENTROPY-CODED image container (VERDICT
  * r11 ranked it the #1 gap: crawled corpora are mostly PNG/JPEG, and
  * every such payload used to quarantine): PNG, 8-bit truecolor RGB
  * (color type 2), non-interlaced — built from public pieces only:
  * the RFC 2083 chunk grammar (big-endian lengths, per-chunk CRC-32),
  * java.util.zip.Inflater for the IDAT zlib stream, and the five
  * standard scanline filters (None/Sub/Up/Average/Paeth) defiltered
  * exactly as specified. Everything after inflation is deterministic,
  * so PNG feature extraction joins the oracle-gateable family through
  * the same shared-pixel-formula discipline as [[Ppm]]/[[Bmp]].
  *
  * Envelope (anything else → None → the quarantine row): bit depth 8,
  * color type 2, compression 0, filter method 0, interlace 0 (Adam7
  * is a resolution-progressive layout, not a decode necessity for a
  * curation pipeline — out of envelope, quarantined, never faked).
  * Integrity: every chunk's CRC-32 is verified (a bit-rotted chunk
  * quarantines), and the inflated byte count must equal
  * height·(1 + 3·width) exactly (truncated IDAT quarantines).
  *
  * Scale note: like [[Ppm]]/[[Bmp]]/[[Wav]] — one forward pass per
  * payload, batch-invoked from mapPartitions; embarrassingly
  * parallel, shuffles nothing.
  */
object Png {

  /** A parsed 8-bit PNG; `raster` is the DEFILTERED top-down RGB byte
    * array (3·w·h bytes — unlike Ppm/Bmp there is no zero-copy alias:
    * defiltering must materialize; grayscale replicates its single
    * channel, palette images resolve through their PLTE). `colorType`
    * records the SOURCE layout (0 gray, 2 truecolor, 3 palette) so
    * the decode boundary can report what it actually parsed.
    */
  final case class Image(width: Int, height: Int, raster: Array[Byte],
      colorType: Int = 2, interlaced: Boolean = false)

  /** Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass; a
    * pass's reduced image is every (x0 + i·dx, y0 + j·dy) pixel and
    * carries its OWN scanlines + filter bytes (filter context resets
    * per pass). Passes that select no pixels contribute no scanlines
    * at all.
    */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** The non-empty Adam7 passes of a w×h image with their reduced
    * dims: (x0, y0, dx, dy, pw, ph). */
  private def adam7Passes(w: Int, h: Int): Seq[(Int, Int, Int, Int, Int, Int)] =
    Adam7.toSeq.map { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      (x0, y0, dx, dy, pw, ph)
    }.filter(p => p._5 > 0 && p._6 > 0)

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def i32be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Parse a PNG payload; None outside the envelope or on any
    * integrity failure (bad signature, malformed chunk walk, CRC
    * mismatch, missing IHDR/IDAT/IEND, zlib error, short/long
    * inflated stream, unknown filter type).
    */
  def parse(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 8 + 25 + 12) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }
    var pos = 8
    var w = -1
    var h = -1
    var color = -1
    var inter = 0
    var plte: Array[Byte] = null
    var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32
    while (!sawEnd) {
      if (pos.toLong + 12L > bytes.length) return None
      val len = i32be(bytes, pos)
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      crc.reset()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != i32be(bytes, pos + 8 + len)) return None
      val body = pos + 8
      tag match {
        case "IHDR" =>
          if (len != 13 || w >= 0) return None // exactly one IHDR, first
          w = i32be(bytes, body)
          h = i32be(bytes, body + 4)
          val depth = bytes(body + 8)
          color = bytes(body + 9)
          val comp = bytes(body + 10)
          val filt = bytes(body + 11)
          inter = bytes(body + 12)
          if (w < 1 || h < 1 || depth != 8 ||
            (color != 0 && color != 2 && color != 3) || comp != 0 ||
            filt != 0 || (inter != 0 && inter != 1)) return None
        case "PLTE" =>
          // legal for color types 2 and 3, FORBIDDEN for grayscale;
          // must precede IDAT, one chunk, 1..256 whole RGB entries
          if (w < 0 || color == 0 || plte != null || idat.size > 0)
            return None
          if (len == 0 || len % 3 != 0 || len > 768) return None
          plte = java.util.Arrays.copyOfRange(bytes, body, body + len)
        case "IDAT" =>
          if (w < 0) return None // IHDR must precede IDAT
          idat.write(bytes, body, len)
        case "IEND" =>
          if (len != 0) return None
          sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      pos = body + len + 4
    }
    if (w < 0 || idat.size == 0) return None
    if (color == 3 && plte == null) return None // indexed without a palette
    // inflate the concatenated IDAT zlib stream; the scanline volume
    // must come out EXACTLY h·(1 + bpp·w) bytes (non-interlaced) or
    // the sum of the per-pass reduced scanline volumes (Adam7)
    val bpp = if (color == 2) 3 else 1
    val rawLen =
      if (inter == 0) (1L + bpp.toLong * w).toInt * h
      else adam7Passes(w, h).map { case (_, _, _, _, pw, ph) =>
        (1 + bpp * pw) * ph }.sum
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got != raw.length) return None
      // a stream with trailing pixels beyond h rows is malformed
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe, 0, 1) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // defilter: straight (one filter context) or per Adam7 pass (the
    // filter recurrence resets per pass; pixels scatter to the full
    // raster at (x0 + i·dx, y0 + j·dy))
    val defiltered: Option[Array[Byte]] =
      if (inter == 0) defilter(raw, w, h, bpp)
      else {
        val full = new Array[Byte](bpp * w * h)
        var off = 0
        var ok = true
        adam7Passes(w, h).foreach { case (x0, y0, dx, dy, pw, ph) =>
          if (ok) {
            val sliceLen = (1 + bpp * pw) * ph
            val slice = java.util.Arrays.copyOfRange(raw, off, off + sliceLen)
            off += sliceLen
            defilter(slice, pw, ph, bpp) match {
              case Some(p) =>
                var j = 0
                while (j < ph) {
                  var i = 0
                  while (i < pw) {
                    val src = (j * pw + i) * bpp
                    val dst = ((y0 + j * dy) * w + (x0 + i * dx)) * bpp
                    var b = 0
                    while (b < bpp) { full(dst + b) = p(src + b); b += 1 }
                    i += 1
                  }
                  j += 1
                }
              case None => ok = false
            }
          }
        }
        if (ok) Some(full) else None
      }
    val inter1 = inter == 1
    defiltered.flatMap { px =>
      color match {
        case 2 => Some(Image(w, h, px, 2, inter1))
        case 0 =>
          // replicate the single gray channel into the RGB raster
          val out = new Array[Byte](3 * w * h)
          var p = 0
          while (p < px.length) {
            out(3 * p) = px(p); out(3 * p + 1) = px(p); out(3 * p + 2) = px(p)
            p += 1
          }
          Some(Image(w, h, out, 0, inter1))
        case _ =>
          // palette lookup; an index past the PLTE quarantines (the
          // spec calls it an error, and inventing a color would be a
          // silent wrong answer)
          val n = plte.length / 3
          val out = new Array[Byte](3 * w * h)
          var p = 0
          while (p < px.length) {
            val ix = px(p) & 0xff
            if (ix >= n) return None
            out(3 * p) = plte(3 * ix)
            out(3 * p + 1) = plte(3 * ix + 1)
            out(3 * p + 2) = plte(3 * ix + 2)
            p += 1
          }
          Some(Image(w, h, out, 3, inter1))
      }
    }
  }

  /** Undo the per-scanline filter (type byte + filtered bytes per
    * row); bpp = bytes per pixel (3 truecolor, 1 gray/indexed — the
    * left/upper-left taps sit one PIXEL back, which is bpp bytes).
    * None on an unknown filter type.
    */
  private def defilter(raw: Array[Byte], w: Int, h: Int,
      bpp: Int): Option[Array[Byte]] = {
    val stride = bpp * w
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
          case _ => return None
        }
        out(rowOut + x) = rec.toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** The Paeth predictor, verbatim from the spec. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** (R, G, B) at (x, y), top-left origin — positional accessor for
    * the spec's filter-path pins (channel means are row-order
    * invariant; only positional reads catch a wrong predictor).
    */
  def sample(img: Image, x: Int, y: Int): (Int, Int, Int) = {
    val p = 3 * (y * img.width + x)
    ((img.raster(p) & 0xff, img.raster(p + 1) & 0xff, img.raster(p + 2) & 0xff))
  }

  /** Per-channel (R, G, B) means — exact integer sums, one double
    * division each (the [[Ppm.channelMeans]] shape).
    */
  def channelMeans(img: Image): Array[Double] = {
    val sums = new Array[Long](3)
    val n = img.width * img.height
    var p = 0
    while (p < img.raster.length) {
      sums(0) += img.raster(p) & 0xff
      sums(1) += img.raster(p + 1) & 0xff
      sums(2) += img.raster(p + 2) & 0xff
      p += 3
    }
    sums.map(_.toDouble / n)
  }

  /** CRC-32 of type+data, shared by the encoder below and tests. */
  private[graft] def chunkCrc(tag: String, data: Array[Byte]): Int = {
    val crc = new java.util.zip.CRC32
    crc.update(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    crc.update(data)
    crc.getValue.toInt
  }

  /** Build a REAL single-IDAT PNG from a top-down RGB raster with a
    * caller-chosen filter type per row (the filtered bytes are
    * computed by inverting [[defilter]]'s recurrences). The zlib
    * stream uses STORED deflate blocks, so the payload size is a pure
    * function of the dims — what keeps n_bytes SQL-derivable for the
    * oracle while the bytes stay genuine PNG any viewer opens.
    */
  private[graft] def encode(w: Int, h: Int, rgb: Array[Byte],
      filterOf: Int => Int): Array[Byte] =
    encodeWith(w, h, 2, rgb, null, filterOf)

  /** Grayscale (color type 0) encoder: one byte per pixel. */
  private[graft] def encodeGray(w: Int, h: Int, gray: Array[Byte],
      filterOf: Int => Int): Array[Byte] =
    encodeWith(w, h, 0, gray, null, filterOf)

  /** Palette (color type 3) encoder: `plte` is the 3n-byte RGB entry
    * table (written as a PLTE chunk), `idx` one palette index per
    * pixel. */
  private[graft] def encodePalette(w: Int, h: Int, plte: Array[Byte],
      idx: Array[Byte], filterOf: Int => Int): Array[Byte] =
    encodeWith(w, h, 3, idx, plte, filterOf)

  /** Filter one raster (h rows of bpp·w bytes) into scanline form
    * (filter byte + filtered bytes per row); `yBase` offsets the row
    * index handed to `filterOf` so Adam7 passes keep cycling through
    * the filter schedule instead of restarting at the same type.
    */
  private def filterRaster(px: Array[Byte], w: Int, h: Int, bpp: Int,
      filterOf: Int => Int, yBase: Int): Array[Byte] = {
    val stride = bpp * w
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = filterOf(yBase + y)
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = px(y * stride + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = enc.toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** Adam7 truecolor encoder: the full raster splits into the 7
    * reduced pass images, each filtered with its OWN context (the
    * decode side's per-pass reset is what this exercises), scanline
    * volumes concatenated into one stored-block zlib stream.
    */
  private[graft] def encodeAdam7(w: Int, h: Int, rgb: Array[Byte],
      filterOf: Int => Int): Array[Byte] = {
    val bpp = 3
    val buf = new java.io.ByteArrayOutputStream()
    var yBase = 0
    adam7Passes(w, h).foreach { case (x0, y0, dx, dy, pw, ph) =>
      val pass = new Array[Byte](bpp * pw * ph)
      var j = 0
      while (j < ph) {
        var i = 0
        while (i < pw) {
          val src = ((y0 + j * dy) * w + (x0 + i * dx)) * bpp
          val dst = (j * pw + i) * bpp
          var b = 0
          while (b < bpp) { pass(dst + b) = rgb(src + b); b += 1 }
          i += 1
        }
        j += 1
      }
      val f = filterRaster(pass, pw, ph, bpp, filterOf, yBase)
      buf.write(f, 0, f.length)
      yBase += ph
    }
    finishPng(w, h, 2, 1, null, buf.toByteArray)
  }

  private def encodeWith(w: Int, h: Int, color: Int, px: Array[Byte],
      plte: Array[Byte], filterOf: Int => Int): Array[Byte] = {
    val bpp = if (color == 2) 3 else 1
    val raw = filterRaster(px, w, h, bpp, filterOf, 0)
    finishPng(w, h, color, 0, plte, raw)
  }

  private def finishPng(w: Int, h: Int, color: Int, interlace: Int,
      plte: Array[Byte], raw: Array[Byte]): Array[Byte] = {
    // zlib with stored blocks: 0x78 0x01 header, [final, len, ~len]
    // block headers, adler32 trailer — deterministic size raw+11 for
    // raw <= 65535 (true for every generated payload)
    val zout = new java.io.ByteArrayOutputStream()
    zout.write(0x78); zout.write(0x01)
    var off = 0
    while (off < raw.length) {
      val n = math.min(65535, raw.length - off)
      val fin = if (off + n == raw.length) 1 else 0
      zout.write(fin); zout.write(n & 0xff); zout.write((n >> 8) & 0xff)
      zout.write((~n) & 0xff); zout.write(((~n) >> 8) & 0xff)
      zout.write(raw, off, n)
      off += n
    }
    val ad = new java.util.zip.Adler32
    ad.update(raw)
    val a = ad.getValue
    zout.write(((a >> 24) & 0xff).toInt); zout.write(((a >> 16) & 0xff).toInt)
    zout.write(((a >> 8) & 0xff).toInt); zout.write((a & 0xff).toInt)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    def writeChunk(tag: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(data, 0, len)
      val c = chunkCrc(tag, data)
      out.write((c >> 24) & 0xff); out.write((c >> 16) & 0xff)
      out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    val ihdr = new Array[Byte](13)
    def p32(o: Int, v: Int): Unit = {
      ihdr(o) = (v >> 24).toByte; ihdr(o + 1) = (v >> 16).toByte
      ihdr(o + 2) = (v >> 8).toByte; ihdr(o + 3) = v.toByte
    }
    p32(0, w); p32(4, h)
    ihdr(8) = 8; ihdr(9) = color.toByte; ihdr(10) = 0; ihdr(11) = 0
    ihdr(12) = interlace.toByte
    writeChunk("IHDR", ihdr)
    if (plte != null) writeChunk("PLTE", plte)
    writeChunk("IDAT", zout.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
