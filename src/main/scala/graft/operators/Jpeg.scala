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
  * sequential (SOF0), exactly one component, 1×1 sampling, no
  * progressive (SOF2), scan must decode every block and be followed
  * by EOI. DRI restart intervals (r14) ARE in the envelope: at each
  * interval boundary the reader byte-aligns, requires the modulo-8
  * RST marker sequence and resets the DC predictor(s) — common in
  * wild baseline JPEGs (every libjpeg encode with restart markers).
  * Integrity: truncated entropy data (bit reader runs dry), an
  * undefined Huffman code, a missing table, a missing or out-of-
  * sequence restart marker all quarantine.
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
    /** Consume the restart marker RST<m> (T.81 E.1.4): discard the
      * current byte's remaining pad bits, skip optional 0xFF fill
      * bytes, then require exactly FF D0+m — a wrong modulo sequence
      * or a missing marker is corruption (the decoder does not
      * resync-scan; the gated corpus is not error-concealing). */
    def restartMarker(m: Int): Boolean = {
      nbits = 0; acc = 0
      var p = pos
      while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
        (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 2 > b.length) return false
      if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xff) != (0xd0 + m)) return false
      pos = p + 2
      true
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
    var ri = 0 // DRI restart interval in MCUs; 0 = none
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
        case 0xdd => // DRI (T.81 B.2.4.4): restart interval in MCUs
          if (len != 4) return None
          ri = u16(bytes, body)
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
    var mcu = 0 // single-component scan: one block per MCU
    var rst = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        // restart boundary: byte-aligned RST<m> (m cycles 0..7), DC
        // predictor resets — the resync that bounds error propagation
        // in a wild stream (no marker after the final interval)
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!br.restartMarker(rst % 8)) return None
          rst += 1
          pred = 0
        }
        mcu += 1
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

  // ---------------------------------------------------------------
  // COLOR envelope (r13, F23b): baseline multi-component decode —
  // crawled corpora are overwhelmingly 3-component YCbCr, most of it
  // 4:2:0. Everything below is the same public spec machinery as the
  // grayscale path plus the three things color adds: per-component
  // table SELECTION (quant id from SOF, DC/AC Huffman ids from SOS),
  // MCU-INTERLEAVED block order (per MCU: each component's v×h blocks
  // row-major, own DC predictor per component), and chroma upsampling
  // (replication) + the JFIF YCbCr→RGB affine with floor(x+0.5) and
  // clamp — floor-based so an oracle reproduces it bit-for-bit in
  // doubles.
  //
  // Envelope: 8-bit SOF0 baseline OR SOF2 progressive (r14 — the
  // scan-accumulating decoder below), 1 or 3 components; sampling all
  // 1×1 (4:4:4 / grayscale) or Y 2×2 with 1×1 chroma (4:2:0); DRI
  // restart intervals supported in both modes (per-MCU/data-unit
  // resync, predictors + EOBRUN reset). Everything else → None →
  // quarantine, same custody as the grayscale path.
  // ---------------------------------------------------------------

  /** A decoded color image: top-down row-major planes 0..255.
    * `channels` = source component count (1 ⇒ r=g=b=Y). */
  final case class ImageRGB(width: Int, height: Int, channels: Int,
      r: Array[Int], g: Array[Int], b: Array[Int], samp: Int = 0x22)

  private final class Comp(val id: Int, val hs: Int, val vs: Int, val tq: Int) {
    var dcId: Int = 0
    var acId: Int = 0
    var pred: Int = 0
    var plane: Array[Int] = null
    var pw: Int = 0
  }

  /** Decode one 8×8 block (DC diff + AC run-length) into `coef`
    * (dequantized, natural order). Returns the new DC predictor, or
    * Int.MinValue on any decode fault. */
  private def decodeBlock(br: BitReader, dc: Huff, ac: Huff,
      quant: Array[Int], pred0: Int, coef: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    val t = br.decodeHuff(dc)
    if (br.truncated || t < 0 || t > 11) return Int.MinValue
    val diff = extend(br.readBits(t), t)
    if (br.truncated) return Int.MinValue
    val pred = pred0 + diff
    coef(0) = pred * quant(0)
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      val rs = br.decodeHuff(ac)
      if (br.truncated || rs < 0) return Int.MinValue
      val r = rs >> 4
      val s = rs & 0xf
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else eob = true
      } else {
        k += r
        if (k > 63) return Int.MinValue
        coef(ZigZag(k)) = extend(br.readBits(s), s) * quant(k)
        if (br.truncated) return Int.MinValue
        k += 1
      }
    }
    pred
  }

  /** The SOFn marker of a JPEG stream (first frame header found by
    * the length walk), or None if the walk derails before one. */
  private def sofMarker(bytes: Array[Byte]): Option[Int] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val m = bytes(pos + 1) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return Some(m)
      if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      val len = u16(bytes, pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return None
      pos = pos + 2 + len
    }
    None
  }

  /** Color decode boundary: baseline (SOF0) or progressive (SOF2)
    * dispatch — everything else quarantines. */
  def parseColor(bytes: Array[Byte]): Option[ImageRGB] = sofMarker(bytes) match {
    case Some(0xc0) => parseColorBaseline(bytes)
    case Some(0xc2) => parseColorProgressive(bytes)
    case _          => None
  }

  private def parseColorBaseline(bytes: Array[Byte]): Option[ImageRGB] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val quants = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = -1
    var h = -1
    var ri = 0 // DRI restart interval in MCUs; 0 = none
    var comps: Array[Comp] = null
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      val m = bytes(pos + 1) & 0xff
      val len = u16(bytes, pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return None
      val body = pos + 4
      m match {
        case 0xdb =>
          var p = body
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3) return None
            if (p + 65 > pos + 2 + len) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = bytes(p + 1 + i) & 0xff; i += 1 }
            quants(tq) = t
            p += 65
          }
        case 0xc0 =>
          if (len < 11) return None
          if ((bytes(body) & 0xff) != 8) return None
          h = u16(bytes, body + 1)
          w = u16(bytes, body + 3)
          val nf = bytes(body + 5) & 0xff
          if (w < 1 || h < 1 || (nf != 1 && nf != 3)) return None
          if (len < 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val o = body + 6 + 3 * i
            new Comp(bytes(o) & 0xff, (bytes(o + 1) & 0xf0) >> 4,
              bytes(o + 1) & 0x0f, bytes(o + 2) & 0x0f)
          }
          val hv = comps.map(c => (c.hs, c.vs)).toSeq
          val ok = hv.forall(_ == ((1, 1))) ||
            (nf == 3 && (hv == Seq((2, 2), (1, 1), (1, 1)) ||
              hv == Seq((2, 1), (1, 1), (1, 1)) ||
              hv == Seq((1, 2), (1, 1), (1, 1))))
          if (!ok || comps.exists(_.tq > 3)) return None
        case 0xc4 =>
          var p = body
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            if (th > 3) return None
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
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            p += 17 + n
          }
        case 0xda =>
          if (comps == null) return None
          val ns = bytes(body) & 0xff
          if (ns != comps.length || len < 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cid = bytes(body + 1 + 2 * i) & 0xff
            val sel = bytes(body + 2 + 2 * i) & 0xff
            comps.find(_.id == cid) match {
              case Some(c) => c.dcId = (sel & 0xf0) >> 4; c.acId = sel & 0x0f
              case None => return None
            }
            i += 1
          }
          scanStart = pos + 2 + len
        case 0xc2 | 0xc1 | 0xc3 => return None // progressive/extended
        case 0xdd => // DRI: restart interval in MCUs
          if (len != 4) return None
          ri = u16(bytes, body)
        case 0xd9 => return None // EOI before any scan
        case _ => ()
      }
      pos = pos + 2 + len
    }
    if (w < 0 || comps == null) return None
    if (comps.exists(c => quants(c.tq) == null || dcTabs(c.dcId) == null ||
      acTabs(c.acId) == null)) return None
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.pw = mcusX * c.hs * 8
      c.plane = new Array[Int](c.pw * mcusY * c.vs * 8)
    }
    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // restart boundary: byte-aligned RST<m>, EVERY component's DC
        // predictor resets (T.81 E.2.4)
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!br.restartMarker(rst % 8)) return None
          rst += 1
          comps.foreach(_.pred = 0)
        }
        mcu += 1
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.vs) {
            var bx = 0
            while (bx < c.hs) {
              val p = decodeBlock(br, dcTabs(c.dcId), acTabs(c.acId),
                quants(c.tq), c.pred, coef)
              if (p == Int.MinValue) return None
              c.pred = p
              // planes are padded to whole MCUs, so the block always
              // fits — idctBlock's bounds clip never triggers here
              idctBlock(coef, c.plane, c.pw, c.plane.length / c.pw,
                (mx * c.hs + bx) * 8, (my * c.vs + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    // same post-scan custody as the grayscale path: stuffed pad pair,
    // FF fill bytes, then EOI
    var p = br.pos
    if (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0x00) p += 2
    while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0xff) p += 1
    if (p + 2 > bytes.length) return None
    if ((bytes(p) & 0xff) != 0xff || (bytes(p + 1) & 0xff) != 0xd9) return None
    Some(planesToRgb(comps, w, h, hmax, vmax))
  }

  /** Decoded component planes → RGB (replication upsampling + the
    * JFIF floor-affine) — shared by the baseline and progressive
    * paths; grayscale passes through as r=g=b. */
  private def planesToRgb(comps: Array[Comp], w: Int, h: Int,
      hmax: Int, vmax: Int): ImageRGB = {
    val rP = new Array[Int](w * h)
    val gP = new Array[Int](w * h)
    val bP = new Array[Int](w * h)
    def clampF(x: Double): Int = {
      val v = math.floor(x + 0.5).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = c.plane(y * c.pw + x)
          rP(y * w + x) = v; gP(y * w + x) = v; bP(y * w + x) = v
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = cy.plane((y * cy.vs / vmax) * cy.pw + (x * cy.hs / hmax))
          val cbv = cb.plane((y * cb.vs / vmax) * cb.pw + (x * cb.hs / hmax))
          val crv = cr.plane((y * cr.vs / vmax) * cr.pw + (x * cr.hs / hmax))
          val i = y * w + x
          rP(i) = clampF(yv + 1.402 * (crv - 128))
          gP(i) = clampF(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))
          bP(i) = clampF(yv + 1.772 * (cbv - 128))
          x += 1
        }
        y += 1
      }
    }
    ImageRGB(w, h, comps.length, rP, gP, bP,
      (comps(0).hs << 4) | comps(0).vs)
  }

  // ---------------------------------------------------------------
  // PROGRESSIVE (SOF2) decode — T.81 Annex G, the r14 envelope close
  // (the r13 verdict's larger JPEG gap: crawled corpora are heavily
  // progressive). Coefficients accumulate across SCANS into per-
  // component zigzag-order planes; each scan is a (spectral band
  // Ss..Se, successive-approximation Ah→Al, component set) slice:
  //
  //  - DC initial (Ss=Se=0, Ah=0): sequential-style DC diffs on the
  //    point-transformed values, stored << Al; interleaved in MCU
  //    order over all frame components (the standard scan script).
  //  - DC refinement (Ah>0): one raw bit per block, OR'd in at Al.
  //  - AC initial (Ss≥1, Ah=0, exactly one component, data units in
  //    the component's own raster): run-length with EOBRUN — an EOB
  //    with run category r skips (1<<r)+ext whole-band block tails.
  //  - AC refinement (Ss≥1, Ah>0): correction bits for every already-
  //    nonzero coefficient crossed, ±1<<Al insertions for new ones,
  //    EOBRUN tails carrying correction bits only (G.1.2.3).
  //
  // DRI restart intervals apply per scan (MCUs when interleaved, data
  // units when not): byte-align, modulo-8 RSTn from 0 per scan, DC
  // predictors AND EOBRUN reset. After EOI every accumulated block
  // dequantizes and IDCTs once — then the shared upsample/convert.
  // Envelope: the baseline one (8-bit, 1 or 3 comps, all-1×1 or
  // Y2×2+chroma1×1); scans must be DC-before-AC per component,
  // single-component AC, Ah = Al+1 on refinements. Anything else —
  // and any marker/entropy corruption — quarantines.
  // ---------------------------------------------------------------

  private def parseColorProgressive(bytes: Array[Byte]): Option[ImageRGB] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val quants = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = -1
    var h = -1
    var ri = 0
    var comps: Array[Comp] = null
    var hmax = 1
    var vmax = 1
    var mcusX = 0
    var mcusY = 0
    // per-component zigzag-order coefficient planes + per-band
    // progression state (which Al each zigzag index has reached)
    var coefZZ: Array[Array[Int]] = null
    var duW: Array[Int] = null // non-interleaved data-unit grid
    var duH: Array[Int] = null
    var nbW: Array[Int] = null // padded (MCU-aligned) block grid
    var dcDone = false
    var sawEoi = false
    while (!sawEoi) {
      if (pos + 2 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      val m = bytes(pos + 1) & 0xff
      if (m == 0xd9) { sawEoi = true }
      else {
        if (pos + 4 > bytes.length) return None
        val len = u16(bytes, pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val body = pos + 4
        m match {
          case 0xdb =>
            var p = body
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xf0) >> 4
              val tq = bytes(p) & 0x0f
              if (pq != 0 || tq > 3) return None
              if (p + 65 > pos + 2 + len) return None
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) { t(i) = bytes(p + 1 + i) & 0xff; i += 1 }
              quants(tq) = t
              p += 65
            }
          case 0xc2 =>
            if (comps != null) return None // one frame only
            if (len < 11) return None
            if ((bytes(body) & 0xff) != 8) return None
            h = u16(bytes, body + 1)
            w = u16(bytes, body + 3)
            val nf = bytes(body + 5) & 0xff
            if (w < 1 || h < 1 || (nf != 1 && nf != 3)) return None
            if (len < 8 + 3 * nf) return None
            comps = Array.tabulate(nf) { i =>
              val o = body + 6 + 3 * i
              new Comp(bytes(o) & 0xff, (bytes(o + 1) & 0xf0) >> 4,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0x0f)
            }
            val hv = comps.map(c => (c.hs, c.vs)).toSeq
            val ok = hv.forall(_ == ((1, 1))) ||
              (nf == 3 && hv == Seq((2, 2), (1, 1), (1, 1)))
            if (!ok || comps.exists(_.tq > 3)) return None
            hmax = comps.map(_.hs).max
            vmax = comps.map(_.vs).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            nbW = comps.map(c => mcusX * c.hs)
            coefZZ = comps.indices.toArray.map(i =>
              new Array[Int](nbW(i) * mcusY * comps(i).vs * 64))
            duW = comps.map(c =>
              ((w * c.hs + hmax - 1) / hmax + 7) / 8)
            duH = comps.map(c =>
              ((h * c.vs + vmax - 1) / vmax + 7) / 8)
          case 0xc0 | 0xc1 | 0xc3 => return None // mixed/unsupported frame
          case 0xc4 =>
            var p = body
            while (p < pos + 2 + len) {
              val tc = (bytes(p) & 0xf0) >> 4
              val th = bytes(p) & 0x0f
              if (th > 3) return None
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
              if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
              p += 17 + n
            }
          case 0xdd =>
            if (len != 4) return None
            ri = u16(bytes, body)
          case 0xda =>
            if (comps == null) return None
            val ns = bytes(body) & 0xff
            if (ns < 1 || len < 6 + 2 * ns) return None
            val scanComps = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = bytes(body + 1 + 2 * i) & 0xff
              val sel = bytes(body + 2 + 2 * i) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              comps(ci).dcId = (sel & 0xf0) >> 4
              comps(ci).acId = sel & 0x0f
              scanComps(i) = ci
              i += 1
            }
            val ss = bytes(body + 1 + 2 * ns) & 0xff
            val se = bytes(body + 2 + 2 * ns) & 0xff
            val ahal = bytes(body + 3 + 2 * ns) & 0xff
            val ah = (ahal & 0xf0) >> 4
            val al = ahal & 0x0f
            val scanEnd = decodeProgressiveScan(bytes, pos + 2 + len, comps,
              scanComps, coefZZ, nbW, duW, duH, mcusX, mcusY, dcTabs, acTabs,
              ss, se, ah, al, ri, dcDone)
            if (scanEnd < 0) return None
            if (ss == 0) dcDone = true
            pos = scanEnd
            // fall through to the marker loop from the scan's end
            // (skip the uniform `pos += 2 + len` below)
            // continue the walk from scanEnd directly:
            // emulate by adjusting before the shared increment
            pos -= 2 + len
          case _ => ()
        }
        pos = pos + 2 + len
      }
    }
    if (comps == null || !dcDone) return None
    // dequantize + IDCT every accumulated block; padded blocks that no
    // scan covered are all-zero and decode to flat 128 outside the
    // visible region
    comps.zipWithIndex.foreach { case (c, i) =>
      if (quants(c.tq) == null) return None
      c.pw = mcusX * c.hs * 8
      c.plane = new Array[Int](c.pw * mcusY * c.vs * 8)
      val q = quants(c.tq)
      val zz = coefZZ(i)
      val bw = nbW(i)
      val nBlocks = zz.length / 64
      val coef = new Array[Int](64)
      var b = 0
      while (b < nBlocks) {
        java.util.Arrays.fill(coef, 0)
        var k = 0
        while (k < 64) {
          val v = zz(b * 64 + k)
          if (v != 0) coef(ZigZag(k)) = v * q(k)
          k += 1
        }
        idctBlock(coef, c.plane, c.pw, c.plane.length / c.pw,
          (b % bw) * 8, (b / bw) * 8)
        b += 1
      }
    }
    Some(planesToRgb(comps, w, h, hmax, vmax))
  }

  /** Decode one progressive scan's entropy segment starting at
    * `start`; returns the byte offset just past it (positioned AT the
    * next marker), or -1 on any fault. */
  private def decodeProgressiveScan(bytes: Array[Byte], start: Int,
      comps: Array[Comp], scanComps: Array[Int],
      coefZZ: Array[Array[Int]], nbW: Array[Int], duW: Array[Int],
      duH: Array[Int], mcusX: Int, mcusY: Int, dcTabs: Array[Huff],
      acTabs: Array[Huff], ss: Int, se: Int, ah: Int, al: Int, ri: Int,
      dcDone: Boolean): Int = {
    val isDc = ss == 0
    if (isDc && se != 0) return -1
    if (!isDc && (scanComps.length != 1 || se < ss || se > 63)) return -1
    if (!isDc && !dcDone) return -1 // AC before any DC scan
    if (ah != 0 && ah != al + 1) return -1
    if (al > 13) return -1
    if (isDc && ah == 0 &&
      scanComps.exists(ci => dcTabs(comps(ci).dcId) == null)) return -1
    if (!isDc && acTabs(comps(scanComps(0)).acId) == null) return -1
    val br = new BitReader(bytes, start)
    var eobrun = 0L
    comps.foreach(_.pred = 0)
    var rst = 0
    var units = 0 // MCUs (interleaved) or data units (single-comp)
    def restartIfDue(): Boolean = {
      if (ri > 0 && units > 0 && units % ri == 0) {
        if (!br.restartMarker(rst % 8)) return false
        rst += 1
        comps.foreach(_.pred = 0)
        eobrun = 0L
      }
      true
    }
    // one block's worth of this scan — zz is the block's 64-entry
    // zigzag slice base offset into the component plane
    def dcInitial(c: Comp, zz: Array[Int], off: Int): Boolean = {
      val t = br.decodeHuff(dcTabs(c.dcId))
      if (br.truncated || t < 0 || t > 11) return false
      val diff = extend(br.readBits(t), t)
      if (br.truncated) return false
      c.pred += diff
      zz(off) = c.pred << al
      true
    }
    def dcRefine(zz: Array[Int], off: Int): Boolean = {
      val bit = br.readBit()
      if (br.truncated) return false
      zz(off) |= bit << al
      true
    }
    def acInitial(c: Comp, zz: Array[Int], off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = br.decodeHuff(acTabs(c.acId))
        if (br.truncated || rs < 0) return false
        val r = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (r == 15) k += 16 // ZRL: sixteen zero coefficients
          else {
            eobrun = (1L << r) - 1
            if (r > 0) {
              eobrun += br.readBits(r)
              if (br.truncated) return false
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          zz(off + k) = extend(br.readBits(s), s) << al
          if (br.truncated) return false
          k += 1
        }
      }
      true
    }
    def acRefine(c: Comp, zz: Array[Int], off: Int): Boolean = {
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var broke = false
        while (k <= se && !broke) {
          val rs = br.decodeHuff(acTabs(c.acId))
          if (br.truncated || rs < 0) return false
          var r = rs >> 4
          val s = rs & 0xf
          var newVal = 0
          if (s != 0) {
            if (s != 1) return false // refinements insert ±1 only
            newVal = if (br.readBit() == 1) p1 else m1
            if (br.truncated) return false
          } else if (r != 15) {
            eobrun = (1L << r)
            if (r > 0) {
              eobrun += br.readBits(r)
              if (br.truncated) return false
            }
            broke = true
          }
          if (!broke) {
            // advance over r zero-HISTORY coefficients, emitting a
            // correction bit for every nonzero-history one crossed
            var placed = false
            while (k <= se && !placed) {
              val cur = zz(off + k)
              if (cur != 0) {
                val bit = br.readBit()
                if (br.truncated) return false
                if (bit == 1 && (cur & p1) == 0)
                  zz(off + k) = cur + (if (cur >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newVal != 0) zz(off + k) = newVal
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        // EOB tail: correction bits only, for the rest of the band
        while (k <= se) {
          val cur = zz(off + k)
          if (cur != 0) {
            val bit = br.readBit()
            if (br.truncated) return false
            if (bit == 1 && (cur & p1) == 0)
              zz(off + k) = cur + (if (cur >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    if (isDc && scanComps.length > 1) {
      // interleaved DC scan in MCU order (the frame's MCU structure)
      if (scanComps.length != comps.length) return -1
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (!restartIfDue()) return -1
          units += 1
          var i = 0
          while (i < scanComps.length) {
            val ci = scanComps(i)
            val c = comps(ci)
            var by = 0
            while (by < c.vs) {
              var bx = 0
              while (bx < c.hs) {
                val blk = (my * c.vs + by) * nbW(ci) + (mx * c.hs + bx)
                val ok =
                  if (ah == 0) dcInitial(c, coefZZ(ci), blk * 64)
                  else dcRefine(coefZZ(ci), blk * 64)
                if (!ok) return -1
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan: the component's own data-unit raster
      val ci = scanComps(0)
      val c = comps(ci)
      var dy = 0
      while (dy < duH(ci)) {
        var dx = 0
        while (dx < duW(ci)) {
          if (!restartIfDue()) return -1
          units += 1
          val blk = dy * nbW(ci) + dx
          val ok =
            if (isDc && ah == 0) dcInitial(c, coefZZ(ci), blk * 64)
            else if (isDc) dcRefine(coefZZ(ci), blk * 64)
            else if (ah == 0) acInitial(c, coefZZ(ci), blk * 64)
            else acRefine(c, coefZZ(ci), blk * 64)
          if (!ok) return -1
          dx += 1
        }
        dy += 1
      }
    }
    // position at the next marker: skip the stuffed pad pair and any
    // FF fill bytes (the baseline post-scan custody, per scan here)
    var p = br.pos
    if (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0x00) p += 2
    while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
      (bytes(p + 1) & 0xff) == 0xff) p += 1
    if (p + 2 > bytes.length) return -1
    if ((bytes(p) & 0xff) != 0xff) return -1
    p
  }

  /** Exact per-channel integer pixel sums (means are one double
    * division each, r6'd at the decode boundary). */
  def channelSums(img: ImageRGB): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < img.r.length) {
      sr += img.r(i); sg += img.g(i); sb += img.b(i); i += 1
    }
    (sr, sg, sb)
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
    /** Emit a restart marker RST<m>: pad the current byte with 1-bits
      * (stuffed if it lands on 0xFF, per T.81 — the pad is entropy
      * bytes, the marker is not), then the raw two marker bytes. */
    def restart(m: Int): Unit = {
      if (n > 0) {
        val pad = acc << (8 - n) | ((1 << (8 - n)) - 1)
        out.write(pad)
        if (pad == 0xff) out.write(0x00)
        acc = 0; n = 0
      }
      out.write(0xff)
      out.write(0xd0 + m)
    }
  }

  /** Encode a grayscale image given per-8×8-block CONSTANT values
    * (row-major block order) — the DC-exact corpus construction. Dims
    * must be multiples of 8.
    */
  private[graft] def encodeBlocks(w: Int, h: Int, blockVals: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
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
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val bw = new BitWriter
    var pred = 0
    var rst = 0
    blockVals.zipWithIndex.foreach { case (cval, mcu) =>
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.restart(rst % 8); rst += 1; pred = 0
      }
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

  /** Encode a 4:2:0 YCbCr image from per-8×8-block CONSTANT values —
    * the DC-exact COLOR corpus construction: `yBlocks` row-major over
    * the (w/8)×(h/8) luma grid, `cbBlocks`/`crBlocks` row-major over
    * the (w/16)×(h/16) chroma grid (each chroma block covers one
    * 16×16 MCU). Dims must be multiples of 16. Constant blocks have
    * zero AC energy and an exactly-representable DC, and replication
    * upsampling of a constant is the constant — so with all-ones
    * quant tables the decode-side planes are bit-exact and the
    * YCbCr→RGB floor-affine is oracle-derivable per block. The bytes
    * are a conformant baseline JFIF-shaped stream: two quant tables
    * (luma 0, chroma 1), two DC + two AC Huffman tables, MCU-
    * interleaved scan with per-component predictors — the full color
    * machinery a wild decoder must implement, on genuine JPEG bytes.
    */
  private[graft] def encodeBlocksColor(w: Int, h: Int, yBlocks: Array[Int],
      cbBlocks: Array[Int], crBlocks: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "DC-exact color corpus uses multiple-of-16 dims")
    val bw0 = w / 8
    val cw = w / 16
    require(yBlocks.length == bw0 * (h / 8), "luma block count mismatch")
    require(cbBlocks.length == cw * (h / 16) && crBlocks.length == cbBlocks.length,
      "chroma block count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT id 0 (luma)
    seg(0xdb, Array(0x01) ++ Array.fill(64)(1)) // DQT id 1 (chroma)
    // SOF0: 3 components — Y 2×2 sampling quant 0, Cb/Cr 1×1 quant 1
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    seg(0xc4, Array(0x00) ++ dcBits ++ (0 to 11).toArray) // DC id 0
    seg(0xc4, Array(0x10) ++ acBits ++ Array(0x00))       // AC id 0
    seg(0xc4, Array(0x01) ++ dcBits ++ (0 to 11).toArray) // DC id 1
    seg(0xc4, Array(0x11) ++ acBits ++ Array(0x00))       // AC id 1
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    // SOS: Y uses tables 0/0, chroma 1/1
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter
    var predY = 0
    var predCb = 0
    var predCr = 0
    var mcuIdx = 0
    var rst = 0
    def writeDc(cval: Int, pred: Int): Int = {
      val dc = 8 * (cval - 128)
      val diff = dc - pred
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      bw.write(0, 1) // EOB
      dc
    }
    var my = 0
    while (my < h / 16) {
      var mx = 0
      while (mx < w / 16) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.restart(rst % 8); rst += 1
          predY = 0; predCb = 0; predCr = 0
        }
        mcuIdx += 1
        var by = 0
        while (by < 2) { // 4 luma blocks, row-major within the MCU
          var bx = 0
          while (bx < 2) {
            predY = writeDc(yBlocks((my * 2 + by) * bw0 + (mx * 2 + bx)), predY)
            bx += 1
          }
          by += 1
        }
        predCb = writeDc(cbBlocks(my * cw + mx), predCb)
        predCr = writeDc(crBlocks(my * cw + mx), predCr)
        mx += 1
      }
      my += 1
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** [[encodeBlocksColor]]'s 4:2:2 sibling — Y 2×1 sampling: the MCU
    * is 16×8 (TWO luma blocks side by side, ONE block per chroma
    * component covering the same 16×8 area), so chroma replicates
    * HORIZONTALLY only. Dims must be multiples of 16 (w) and 8 (h);
    * `yBlocks` row-major over (w/8)×(h/8), chroma over (w/16)×(h/8).
    * Same DC-exact argument as 4:2:0: constant blocks, all-ones quant,
    * replication of a constant is the constant.
    */
  private[graft] def encodeBlocksColor422(w: Int, h: Int, yBlocks: Array[Int],
      cbBlocks: Array[Int], crBlocks: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 8 == 0, "4:2:2 corpus uses multiple-of-(16,8) dims")
    val bw0 = w / 8
    val cw = w / 16
    require(yBlocks.length == bw0 * (h / 8), "luma block count mismatch")
    require(cbBlocks.length == cw * (h / 8) && crBlocks.length == cbBlocks.length,
      "chroma block count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT id 0 (luma)
    seg(0xdb, Array(0x01) ++ Array.fill(64)(1)) // DQT id 1 (chroma)
    // SOF0: Y 2×1 sampling quant 0, Cb/Cr 1×1 quant 1
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      3, 1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1))
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    seg(0xc4, Array(0x00) ++ dcBits ++ (0 to 11).toArray) // DC id 0
    seg(0xc4, Array(0x10) ++ acBits ++ Array(0x00))       // AC id 0
    seg(0xc4, Array(0x01) ++ dcBits ++ (0 to 11).toArray) // DC id 1
    seg(0xc4, Array(0x11) ++ acBits ++ Array(0x00))       // AC id 1
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter
    var predY = 0
    var predCb = 0
    var predCr = 0
    var mcuIdx = 0
    var rst = 0
    def writeDc(cval: Int, pred: Int): Int = {
      val dc = 8 * (cval - 128)
      val diff = dc - pred
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      bw.write(0, 1) // EOB
      dc
    }
    var my = 0
    while (my < h / 8) {
      var mx = 0
      while (mx < w / 16) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.restart(rst % 8); rst += 1
          predY = 0; predCb = 0; predCr = 0
        }
        mcuIdx += 1
        var bx = 0
        while (bx < 2) { // 2 luma blocks side by side within the MCU
          predY = writeDc(yBlocks(my * bw0 + (mx * 2 + bx)), predY)
          bx += 1
        }
        predCb = writeDc(cbBlocks(my * cw + mx), predCb)
        predCr = writeDc(crBlocks(my * cw + mx), predCr)
        mx += 1
      }
      my += 1
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** [[encodeBlocksColor422]]'s transpose — 4:4:0 (Y 1×2) sampling:
    * the MCU is 8×16, carries TWO luma blocks stacked vertically and
    * one chroma pair, each chroma block covering the full MCU so
    * replication is VERTICAL only.
    */
  private[graft] def encodeBlocksColor440(w: Int, h: Int, yBlocks: Array[Int],
      cbBlocks: Array[Int], crBlocks: Array[Int]): Array[Byte] = {
    require(w % 8 == 0 && h % 16 == 0, "4:4:0 corpus uses multiple-of-(8,16) dims")
    val bw0 = w / 8
    val cw = w / 8
    require(yBlocks.length == bw0 * (h / 8), "luma block count mismatch")
    require(cbBlocks.length == cw * (h / 16) && crBlocks.length == cbBlocks.length,
      "chroma block count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT id 0 (luma)
    seg(0xdb, Array(0x01) ++ Array.fill(64)(1)) // DQT id 1 (chroma)
    // SOF0: Y 1×2 sampling quant 0, Cb/Cr 1×1 quant 1
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      3, 1, 0x12, 0, 2, 0x11, 1, 3, 0x11, 1))
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    seg(0xc4, Array(0x00) ++ dcBits ++ (0 to 11).toArray) // DC id 0
    seg(0xc4, Array(0x10) ++ acBits ++ Array(0x00))       // AC id 0
    seg(0xc4, Array(0x01) ++ dcBits ++ (0 to 11).toArray) // DC id 1
    seg(0xc4, Array(0x11) ++ acBits ++ Array(0x00))       // AC id 1
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter
    var predY = 0
    var predCb = 0
    var predCr = 0
    def writeDc(cval: Int, pred: Int): Int = {
      val dc = 8 * (cval - 128)
      val diff = dc - pred
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      bw.write(0, 1) // EOB
      dc
    }
    var my = 0
    while (my < h / 16) {
      var mx = 0
      while (mx < w / 8) {
        var by = 0
        while (by < 2) { // 2 luma blocks stacked within the MCU
          predY = writeDc(yBlocks((my * 2 + by) * bw0 + mx), predY)
          by += 1
        }
        predCb = writeDc(cbBlocks(my * cw + mx), predCb)
        predCr = writeDc(crBlocks(my * cw + mx), predCr)
        mx += 1
      }
      my += 1
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman table body with every `symbols` value at code
    * length 7 (≤ 127 symbols keeps the all-ones code unused, the T.81
    * C.2 requirement) — the generic table the coefficient-level spec
    * encoders declare, with the code of symbols(i) being i. */
  private def genericTable(symbols: Seq[Int]): Array[Int] = {
    require(symbols.size <= 127, "generic table keeps the all-ones code free")
    val bits = Array.fill(16)(0)
    bits(6) = symbols.size // lengths are 1-indexed: index 6 = length 7
    bits ++ symbols
  }

  /** BASELINE encoder for ARBITRARY zigzag-order coefficient blocks
    * (grayscale, all-ones quant) — the reference side of the
    * coefficient-level progressive law: full RS run-length coding
    * (ZRL, EOB), DC diffs, a generic 7-bit AC table built from the
    * symbols actually used. Spec support: the progressive twin below
    * must decode to the identical image.
    */
  private[graft] def encodeCoefBaseline(w: Int, h: Int,
      blocks: Array[Array[Int]]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && blocks.length == (w / 8) * (h / 8))
    require(blocks.forall(_.length == 64))
    def cat(v: Int) = if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    // collect the AC symbols this data needs
    val used = scala.collection.mutable.LinkedHashSet[Int]()
    blocks.foreach { b =>
      var r = 0
      var lastNz = 63
      while (lastNz > 0 && b(lastNz) == 0) lastNz -= 1
      var k = 1
      while (k <= lastNz) {
        if (b(k) == 0) {
          r += 1
          if (r == 16) { used += 0xf0; r = 0 }
        } else {
          used += ((r << 4) | cat(b(k))); r = 0
        }
        k += 1
      }
      if (lastNz < 63) used += 0x00
    }
    if (used.isEmpty) used += 0x00
    val acSyms = used.toSeq
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      1, 1, 0x11, 0))
    seg(0xc4, Array(0x00) ++ Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      ++ (0 to 11).toArray)
    seg(0xc4, Array(0x10) ++ genericTable(acSyms))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter
    def writeAc(sym: Int): Unit = bw.write(acSyms.indexOf(sym), 7)
    def writeVal(v: Int, t: Int): Unit =
      if (t > 0) bw.write(if (v >= 0) v else v + (1 << t) - 1, t)
    var pred = 0
    blocks.foreach { b =>
      val t = cat(b(0) - pred)
      bw.write(t, 4)
      writeVal(b(0) - pred, t)
      pred = b(0)
      var lastNz = 63
      while (lastNz > 0 && b(lastNz) == 0) lastNz -= 1
      var r = 0
      var k = 1
      while (k <= lastNz) {
        if (b(k) == 0) {
          r += 1
          if (r == 16) { writeAc(0xf0); r = 0 }
        } else {
          val s = cat(b(k))
          writeAc((r << 4) | s)
          writeVal(b(k), s)
          r = 0
        }
        k += 1
      }
      if (lastNz < 63) writeAc(0x00)
    }
    out.write(bw.finish())
    marker(0xd9)
    out.toByteArray
  }

  /** PROGRESSIVE encoder for the SAME arbitrary coefficient blocks —
    * the content-bearing twin of the EOBRUN-only corpus script: DC
    * initial at full precision, then per spectral band (split at 32)
    * an AC initial scan at Al=1 (values point-transformed toward
    * zero: ±|v|>>1) and an AC refinement scan Ah=1→Al=0 (newly
    * significant |v|=1 insertions with sign bits, correction bits
    * |v|&1 for every nonzero-history coefficient crossed, ZRL over
    * 16 zero-history runs, EOB with tail correction bits). The
    * refinement emitter mirrors the decoder's G.1.2.3 walk exactly,
    * which is the point — the spec law is progressive ≡ baseline on
    * the same coefficients, pixel-exact.
    */
  private[graft] def encodeCoefProgressive(w: Int, h: Int,
      blocks: Array[Array[Int]]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && blocks.length == (w / 8) * (h / 8))
    def cat(v: Int) = if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def half(v: Int) = if (v >= 0) v >> 1 else -((-v) >> 1) // toward zero
    val bands = Seq((1, 32), (33, 63))
    // symbols per band for initial (on halved values) and refinement
    val acSyms = scala.collection.mutable.LinkedHashSet[Int](0x00, 0xf0, 0x01)
    bands.foreach { case (ss, se) =>
      blocks.foreach { b =>
        var r = 0
        var k = ss
        while (k <= se) {
          val v1 = half(b(k))
          if (v1 == 0) {
            r += 1
            if (r == 16) { r = 0 } // ZRL already included
          } else {
            acSyms += ((r << 4) | cat(v1)); r = 0
          }
          k += 1
        }
      }
    }
    // refinement RS symbols: (r<<4 | 1) for newly-significant runs
    bands.foreach { case (ss, se) =>
      blocks.foreach { b =>
        var r = 0
        var k = ss
        while (k <= se) {
          val av = math.abs(b(k))
          if (av >= 2) () // history-nonzero: correction bit, no run effect
          else if (av == 1) { acSyms += ((r << 4) | 1); r = 0 }
          else { r += 1; if (r == 16) r = 0 }
          k += 1
        }
      }
    }
    val syms = acSyms.toSeq
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    seg(0xc2, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      1, 1, 0x11, 0))
    seg(0xc4, Array(0x00) ++ Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      ++ (0 to 11).toArray)
    seg(0xc4, Array(0x10) ++ genericTable(syms))
    // ---- DC initial, full precision (Al = 0) ----
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x00))
    locally {
      val bw = new BitWriter
      var pred = 0
      blocks.foreach { b =>
        val t = cat(b(0) - pred)
        bw.write(t, 4)
        if (t > 0) bw.write(if (b(0) - pred >= 0) b(0) - pred
          else b(0) - pred + (1 << t) - 1, t)
        pred = b(0)
      }
      out.write(bw.finish())
    }
    bands.foreach { case (ss, se) =>
      // ---- AC initial for this band at Al = 1 ----
      seg(0xda, Array(1, 1, 0x00, ss, se, 0x01))
      locally {
        val bw = new BitWriter
        def writeAc(sym: Int): Unit = bw.write(syms.indexOf(sym), 7)
        blocks.foreach { b =>
          var lastNz = se
          while (lastNz >= ss && half(b(lastNz)) == 0) lastNz -= 1
          var r = 0
          var k = ss
          while (k <= lastNz) {
            val v1 = half(b(k))
            if (v1 == 0) {
              r += 1
              if (r == 16) { writeAc(0xf0); r = 0 }
            } else {
              val s = cat(v1)
              writeAc((r << 4) | s)
              bw.write(if (v1 >= 0) v1 else v1 + (1 << s) - 1, s)
              r = 0
            }
            k += 1
          }
          if (lastNz < se) writeAc(0x00) // EOB run of 1 (r = 0)
        }
        out.write(bw.finish())
      }
      // ---- AC refinement for this band, Ah=1 → Al=0: mirror the
      // decoder's walk (sign bit right after the RS, correction bits
      // inline in position order as zero-history runs are crossed,
      // EOB carrying the tail's correction bits) ----
      seg(0xda, Array(1, 1, 0x00, ss, se, 0x10))
      locally {
        val bw = new BitWriter
        def writeAc(sym: Int): Unit = bw.write(syms.indexOf(sym), 7)
        blocks.foreach { b =>
          var k = ss
          while (k <= se) {
            // LOOKAHEAD for the next newly-significant coefficient:
            // ZRLs are only legal en route to an insertion (the
            // decoder never reads codes after its band is exhausted,
            // so a trailing zero stretch must be a bare EOB)
            var found = -1
            var j = k
            while (j <= se && found < 0) {
              if (math.abs(b(j)) == 1) found = j
              j += 1
            }
            if (found >= 0) {
              // emit the run: ZRL per 16 zero-history zeros crossed
              // (correction bits of history coefficients interleave in
              // position order, exactly as the decoder reads them)
              var r = 0
              val corr = scala.collection.mutable.ArrayBuffer.empty[Int]
              var t = k
              while (t < found) {
                val av = math.abs(b(t))
                if (av >= 2) corr += (av & 1)
                else if (r == 15) {
                  writeAc(0xf0)
                  corr.foreach(bit => bw.write(bit, 1))
                  corr.clear()
                  r = 0
                } else r += 1
                t += 1
              }
              writeAc((r << 4) | 1)
              bw.write(if (b(found) > 0) 1 else 0, 1) // sign
              corr.foreach(bit => bw.write(bit, 1))
              k = found + 1
            } else {
              // no more insertions: EOB (run 1) + the tail's
              // correction bits — unless the last insertion ended
              // exactly at se (the decoder's band is already done)
              writeAc(0x00)
              var t = k
              while (t <= se) {
                if (math.abs(b(t)) >= 2) bw.write(math.abs(b(t)) & 1, 1)
                t += 1
              }
              k = se + 1
            }
          }
        }
        out.write(bw.finish())
      }
    }
    marker(0xd9)
    out.toByteArray
  }

  /** PROGRESSIVE (SOF2) twin of [[encodeBlocksColor]] — the same
    * DC-exact 4:2:0 block corpus as a four-stage progressive stream
    * exercising every Annex-G scan kind with REAL bit content:
    *
    *  1. DC initial, interleaved, Al=4 — the point transform drops a
    *     live bit (DC = 8·(c−128), so bit 3 carries c's parity)
    *  2. DC refinement Ah=4→Al=3 — restores that bit (bits 2..0 of a
    *     ×8 DC are zero, so reconstruction is exact at Al=3)
    *  3. per component: AC initial Ss=1..63 Al=1 — constant blocks
    *     have zero ACs, so the band is pure EOBRUN runs (the run
    *     categories r ∈ {0,1,2} in the declared AC table)
    *  4. per component: AC refinement Ah=1→Al=0 — EOBRUN tails with
    *     zero-history bands (no correction bits, by construction)
    *
    * With `restartInterval` > 0 every scan restarts on its own
    * boundary (MCUs when interleaved, data units when not), EOB runs
    * never crossing a restart.
    */
  private[graft] def encodeBlocksColorProgressive(w: Int, h: Int,
      yBlocks: Array[Int], cbBlocks: Array[Int], crBlocks: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "DC-exact color corpus uses multiple-of-16 dims")
    val bw0 = w / 8
    val cw = w / 16
    require(yBlocks.length == bw0 * (h / 8), "luma block count mismatch")
    require(cbBlocks.length == cw * (h / 16) && crBlocks.length == cbBlocks.length,
      "chroma block count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    seg(0xdb, Array(0x01) ++ Array.fill(64)(1))
    seg(0xc2, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    // AC tables: three length-2 canonical codes for EOB run categories
    // r = 0, 1, 2 (vals 0x00, 0x10, 0x20 → codes 00, 01, 10)
    val acBits = Array(0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    seg(0xc4, Array(0x00) ++ dcBits ++ (0 to 11).toArray)
    seg(0xc4, Array(0x10) ++ acBits ++ Array(0x00, 0x10, 0x20))
    seg(0xc4, Array(0x01) ++ dcBits ++ (0 to 11).toArray)
    seg(0xc4, Array(0x11) ++ acBits ++ Array(0x00, 0x10, 0x20))
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    def dcOf(cval: Int) = 8 * (cval - 128)
    // ---- scan 1: DC initial, interleaved, Al = 4 ----
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x04))
    locally {
      val bw = new BitWriter
      var predY = 0; var predCb = 0; var predCr = 0
      var mcu = 0; var rst = 0
      def wv(cval: Int, pred: Int): Int = {
        val v = dcOf(cval) >> 4 // arithmetic point transform
        val diff = v - pred
        val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bw.write(t, 4)
        if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        v
      }
      for (my <- 0 until h / 16; mx <- 0 until w / 16) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart(rst % 8); rst += 1
          predY = 0; predCb = 0; predCr = 0
        }
        mcu += 1
        for (by <- 0 until 2; bx <- 0 until 2)
          predY = wv(yBlocks((my * 2 + by) * bw0 + (mx * 2 + bx)), predY)
        predCb = wv(cbBlocks(my * cw + mx), predCb)
        predCr = wv(crBlocks(my * cw + mx), predCr)
      }
      out.write(bw.finish())
    }
    // ---- scan 2: DC refinement, interleaved, Ah=4 → Al=3 ----
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x43))
    locally {
      val bw = new BitWriter
      var mcu = 0; var rst = 0
      for (my <- 0 until h / 16; mx <- 0 until w / 16) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart(rst % 8); rst += 1
        }
        mcu += 1
        for (by <- 0 until 2; bx <- 0 until 2)
          bw.write((dcOf(yBlocks((my * 2 + by) * bw0 + (mx * 2 + bx))) >> 3) & 1, 1)
        bw.write((dcOf(cbBlocks(my * cw + mx)) >> 3) & 1, 1)
        bw.write((dcOf(crBlocks(my * cw + mx)) >> 3) & 1, 1)
      }
      out.write(bw.finish())
    }
    // ---- scans 3..8: per-component AC initial then AC refinement,
    // all-EOBRUN bands (constant blocks have zero ACs) ----
    val compSel = Seq((1, 0x00, bw0 * (h / 8)), (2, 0x11, cw * (h / 16)),
      (3, 0x11, cw * (h / 16)))
    def eobScan(ahal: Int): Unit = compSel.foreach { case (cid, sel, nUnits) =>
      seg(0xda, Array(1, cid, sel, 1, 63, ahal))
      val bw = new BitWriter
      def emitRuns(n0: Int): Unit = {
        var n = n0
        while (n > 0) {
          val run = if (n >= 4) math.min(n, 7) else if (n >= 2) math.min(n, 3) else 1
          val r = if (run >= 4) 2 else if (run >= 2) 1 else 0
          bw.write(r, 2) // canonical code for val r<<4 IS r at length 2
          if (r > 0) bw.write(run - (1 << r), r)
          n -= run
        }
      }
      if (restartInterval > 0) {
        var left = nUnits
        var rst = 0
        while (left > 0) {
          val seg0 = math.min(restartInterval, left)
          emitRuns(seg0)
          left -= seg0
          if (left > 0) { bw.restart(rst % 8); rst += 1 }
        }
      } else emitRuns(nUnits)
      out.write(bw.finish())
    }
    eobScan(0x01) // AC initial, Al = 1
    eobScan(0x10) // AC refinement, Ah=1 → Al=0
    marker(0xd9)
    out.toByteArray
  }
}
