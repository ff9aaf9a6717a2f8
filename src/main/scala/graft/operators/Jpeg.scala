package graft.operators

/** A REAL decoder for baseline JPEG (ITU-T T.81), grayscale envelope —
  * the second entropy-coded container next to [[Png]], and the format
  * (with PNG) that covers most of a crawled image corpus. Everything
  * is the public spec: marker segments (SOI/DQT/DHT/SOF0/SOS/EOI,
  * APPn/COM skipped by length), canonical Huffman tables built from
  * DHT's BITS/HUFFVAL, the entropy-coded scan with 0xFF00 byte
  * stuffing, DC prediction + magnitude-category extension, AC
  * run-length with EOB/ZRL, zigzag order, dequantization, and the
  * separable double-precision IDCT with round+clamp+level-shift.
  *
  * Envelope (anything else → None → quarantine): 8-bit baseline
  * sequential (SOF0), exactly one component, 1×1 sampling, no restart
  * intervals, no progressive (SOF2), scan must decode every block and
  * be followed by EOI. Integrity: truncated entropy data (bit reader
  * runs dry), an undefined Huffman code, or a missing table all
  * quarantine.
  *
  * Exactness note for the gated corpus: JPEG is lossy in general, but
  * a block whose pixels are CONSTANT c has DC = 8·(c−128) and zero
  * ACs after the exact FDCT; with an all-ones quant table the decode
  * side computes IDCT(DC)/8 = c−128 exactly in doubles, so
  * round+shift returns c bit-exactly — which is what lets the oracle
  * re-derive every feature from the block formula while the decoder
  * still runs the full general machinery (Huffman, zigzag, dequant,
  * IDCT) over genuine JPEG bytes any viewer opens.
  *
  * Scale note: like the sibling codecs — one forward pass per
  * payload, batch-invoked from mapPartitions; shuffles nothing.
  */
object Jpeg {

  /** A decoded grayscale image: top-down row-major pixels 0..255. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman decode table from DHT's (BITS, HUFFVAL):
    * `codes(len)` holds (firstCode, firstIndex) per length 1..16.
    */
  private final case class Huff(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per T.81 F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader with 0xFF00 stuffing; a marker
    * byte (0xFF followed by non-zero) ends the segment.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var truncated = false
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { truncated = true; return 0 }
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) { truncated = true; return 0 }
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed data 0xFF
          else { truncated = true; return 0 } // marker inside scan
          byte = 0xff
        }
        acc = byte; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def decodeHuff(h: Huff): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l) && code >= h.minCode(l))
          return h.vals(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | readBit()
        l += 1
      }
      truncated = true
      -1
    }
  }

  /** Magnitude-category extension (T.81 F.2.2.1). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  def parse(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    var quant: Array[Int] = null
    var dcTab: Huff = null
    var acTab: Huff = null
    var w = -1
    var h = -1
    var scanStart = -1
    // marker segment walk up to SOS
    while (scanStart < 0) {
      if (pos + 4 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      val m = bytes(pos + 1) & 0xff
      val len = u16(bytes, pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return None
      val body = pos + 4
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var p = body
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xf0) >> 4
            if (pq != 0) return None // 16-bit tables out of envelope
            if (p + 65 > pos + 2 + len) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = bytes(p + 1 + i) & 0xff; i += 1 }
            quant = t // single-component: last table wins; id checked at SOF
            p += 65
          }
        case 0xc0 => // SOF0 baseline
          if (len < 11) return None
          if ((bytes(body) & 0xff) != 8) return None
          h = u16(bytes, body + 1)
          w = u16(bytes, body + 3)
          val nf = bytes(body + 5) & 0xff
          if (w < 1 || h < 1 || nf != 1) return None
          if ((bytes(body + 7) & 0xff) != 0x11) return None // 1x1 sampling
        case 0xc4 => // DHT (possibly several tables per segment)
          var p = body
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xf0) >> 4
            if (p + 17 > pos + 2 + len) return None
            val bits = new Array[Int](16)
            var n = 0
            var i = 0
            while (i < 16) { bits(i) = bytes(p + 1 + i) & 0xff; n += bits(i); i += 1 }
            if (p + 17 + n > pos + 2 + len) return None
            val vals = new Array[Int](n)
            i = 0
            while (i < n) { vals(i) = bytes(p + 17 + i) & 0xff; i += 1 }
            val huff = Huff(bits, vals)
            if (tc == 0) dcTab = huff else acTab = huff
            p += 17 + n
          }
        case 0xda => // SOS
          if (len < 8) return None
          if ((bytes(body) & 0xff) != 1) return None
          scanStart = pos + 2 + len
        case 0xc2 | 0xc1 | 0xc3 => return None // progressive/extended
        case 0xdd => return None // restart intervals out of envelope
        case 0xd9 => return None // EOI before any scan
        case _ => () // APPn/COM and friends: skipped by length
      }
      pos = pos + 2 + len
    }
    if (w < 0 || quant == null || dcTab == null || acTab == null) return None
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val pixels = new Array[Int](w * h)
    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val t = br.decodeHuff(dcTab)
        if (br.truncated || t < 0 || t > 11) return None
        val diff = extend(br.readBits(t), t)
        if (br.truncated) return None
        pred += diff
        coef(0) = pred * quant(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = br.decodeHuff(acTab)
          if (br.truncated || rs < 0) return None
          val r = rs >> 4
          val s = rs & 0xf
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += r
            if (k > 63) return None
            coef(ZigZag(k)) = extend(br.readBits(s), s) * quant(k)
            if (br.truncated) return None
            k += 1
          }
        }
        idctBlock(coef, pixels, w, h, bx * 8, by * 8)
        bx += 1
      }
      by += 1
    }
    // after the scan: skip pad bits, expect EOI. Two legal byte shapes
    // can sit between the last consumed bit and the marker: a final
    // entropy byte of 0xFF is emitted as the stuffed pair FF 00 (real
    // encoders produce this when padding with 1-bits), and any number
    // of 0xFF fill bytes may precede a marker (T.81 B.1.1.2) — both
    // are data the bit reader never needed, not corruption.
    var p = br.pos
    if (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0x00) p += 2
    while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0xff) p += 1
    if (p + 2 > bytes.length) return None
    if ((bytes(p) & 0xff) != 0xff || (bytes(p + 1) & 0xff) != 0xd9) return None
    Some(Image(w, h, pixels))
  }

  /** Separable 2-D IDCT (double precision, the T.81 annex A formula
    * directly — determinism beats speed here), round + clamp + +128
    * level shift, clipped to image bounds for edge blocks.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int], w: Int, h: Int,
      x0: Int, y0: Int): Unit = {
    val c = new Array[Double](8)
    c(0) = 1.0 / math.sqrt(2.0)
    var i = 1
    while (i < 8) { c(i) = 1.0; i += 1 }
    var y = 0
    while (y < 8 && y0 + y < h) {
      var x = 0
      while (x < 8 && x0 + x < w) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cf = coef(v * 8 + u)
            if (cf != 0)
              s += c(u) * c(v) * cf *
                math.cos((2 * x + 1) * u * math.Pi / 16.0) *
                math.cos((2 * y + 1) * v * math.Pi / 16.0)
            u += 1
          }
          v += 1
        }
        val p = math.rint(s / 4.0 + 128.0).toInt
        out((y0 + y) * w + (x0 + x)) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
  }

  /** Exact integer pixel sum + mean (one double division). */
  def meanPixel(img: Image): Double = {
    var s = 0L
    var i = 0
    while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
    s.toDouble / img.pixels.length
  }

  // ---------------------------------------------------------------
  // Encoder (for the gated corpus and round-trip specs): baseline
  // grayscale, all-ones quant table, compact custom Huffman tables
  // declared in DHT (12 four-bit DC category codes; a single one-bit
  // AC code for EOB — canonical, conformant, parses anywhere).
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def write(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (n > 0) {
        val pad = acc << (8 - n) | ((1 << (8 - n)) - 1) // pad with 1s
        out.write(pad)
        if (pad == 0xff) out.write(0x00)
      }
      out.toByteArray
    }
  }

  /** Encode a grayscale image given per-8×8-block CONSTANT values
    * (row-major block order) — the DC-exact corpus construction. Dims
    * must be multiples of 8.
    */
  private[graft] def encodeBlocks(w: Int, h: Int, blockVals: Array[Int]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "DC-exact corpus uses multiple-of-8 dims")
    require(blockVals.length == (w / 8) * (h / 8),
      s"need ${(w / 8) * (h / 8)} block values, got ${blockVals.length}")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT: all-ones, id 0
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 comp, 1x1, quant 0
    // DHT DC (Tc=0,Th=0): 12 categories, all length-4 canonical codes
    seg(0xc4, Array(0x00) ++ Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      ++ (0 to 11).toArray)
    // DHT AC (Tc=1,Th=0): the single length-1 code 0 = EOB
    seg(0xc4, Array(0x10) ++ Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      ++ Array(0x00))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val bw = new BitWriter
    var pred = 0
    blockVals.foreach { cval =>
      val dc = 8 * (cval - 128)
      val diff = dc - pred
      pred = dc
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.write(t, 4) // DC category: canonical code == category value
      if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      bw.write(0, 1) // EOB
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }
}
