package extractous.ocr

import java.io.ByteArrayOutputStream

/** Baseline JPEG codec (ITU T.81), from scratch.
  *
  * Decoder: baseline sequential (SOF0), 8-bit, 1 or 3 components with
  * sampling factors in {1, 2} — Huffman tables read from DHT, dequant + IDCT,
  * luma plane out (what OCR consumes; chroma blocks are entropy-decoded to
  * advance the bitstream and discarded). Progressive (SOF2), arithmetic and
  * 12-bit streams raise — the row fails with a status, never wrong text.
  *
  * Encoder: single-component grayscale baseline with a gentle flat quant table
  * (Q=2): for binary ink/paper sources the worst-case IDCT reconstruction
  * error (≤ 16 gray levels) is far inside the 128-level binarization margin,
  * so decode-then-binarize is pixel-exact — JPEG is lossy, the BINARIZED
  * round trip is not. Standard Annex-K luminance Huffman tables are emitted.
  *
  * The reference OCRs JPEG crawl images through Tika/Tesseract
  * (/root/reference/config.go:424-435, README.md:271); this supplies the
  * decode stage for the same path here.
  */
object Jpeg {

  // ---- shared tables ----

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Flat quantization: DC=1 keeps category ≤ 11; AC=2 keeps category ≤ 10. */
  private val QuantTable: Array[Int] = Array.tabulate(64)(i => if (i == 0) 1 else 2)

  // standard luminance Huffman tables (T.81 Annex K.3)
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private def cc(k: Int): Double = if (k == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Precomputed DCT basis: Basis(k)(x) = cos((2x+1)·k·π/16). Trig inside the
    * per-block loops would cost ~10⁶ cos() calls per image and dominate the
    * whole extraction pipeline.
    */
  private val Basis: Array[Array[Double]] =
    Array.tabulate(8, 8)((k, x) => math.cos((2 * x + 1) * k * math.Pi / 16))

  // ======================= encoder =======================

  /** (bits-of-length-i counts, symbol values) → symbol → (code, length). */
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  def encode(g: Gray): Array[Byte] = encode(g, 0)

  /** `restartInterval` > 0 emits DRI + RSTn markers every that many MCUs —
    * real crawl JPEGs carry them, and the decoder's restart path needs an
    * in-repo producer to round-trip against.
    */
  def encode(g: Gray, restartInterval: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    // APP0 JFIF
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT (table 0, 8-bit)
    seg(0xdb, 0 +: Zigzag.map(QuantTable(_)))
    // SOF0: 8-bit, h, w, 1 component (id 1, 1x1 sampling, qtable 0)
    seg(0xc0, Array(8, g.height >> 8, g.height & 0xff, g.width >> 8, g.width & 0xff, 1, 1, 0x11, 0))
    // DHT: DC class0 id0, AC class1 id0
    seg(0xc4, (0 +: (DcBits ++ DcVals)).toArray)
    seg(0xc4, (0x10 +: (AcBits ++ AcVals)).toArray)
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    // SOS: 1 component, dc table 0 / ac table 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))

    val dcTab = buildEncTable(DcBits, DcVals)
    val acTab = buildEncTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val blocksX = (g.width + 7) / 8
    val blocksY = (g.height + 7) / 8
    var prevDc = 0
    var mcuCount = 0
    var rstIdx = 0
    val px = new Array[Double](64)
    val coef = new Array[Int](64)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        // load block with edge replication, level-shifted
        var i = 0
        while (i < 64) {
          val x = math.min(bx * 8 + i % 8, g.width - 1)
          val y = math.min(by * 8 + i / 8, g.height - 1)
          val lum = if (g(x, y) != 0) 0 else 255 // ink black, paper white
          px(i) = lum - 128.0
          i += 1
        }
        // FDCT + quantize (separable: rows then columns, basis-table lookups)
        val tmp = new Array[Double](64)
        var y1 = 0
        while (y1 < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var x0 = 0
            while (x0 < 8) { s += px(y1 * 8 + x0) * Basis(v)(x0); x0 += 1 }
            tmp(y1 * 8 + v) = s
            v += 1
          }
          y1 += 1
        }
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var y0 = 0
            while (y0 < 8) { s += tmp(y0 * 8 + v) * Basis(u)(y0); y0 += 1 }
            val c = 0.25 * cc(u) * cc(v) * s
            coef(u * 8 + v) = math.round(c / QuantTable(u * 8 + v)).toInt
            v += 1
          }
          u += 1
        }
        // DC diff
        val dc = coef(0)
        val diff = dc - prevDc
        prevDc = dc
        val dcCat = category(diff)
        val (dcCode, dcLen) = dcTab(dcCat)
        bw.write(dcCode, dcLen)
        if (dcCat > 0) bw.write(if (diff >= 0) diff else diff + (1 << dcCat) - 1, dcCat)
        // AC run-length
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = acTab(0xf0); bw.write(c, l); run -= 16 }
            val cat = category(v)
            val (c, l) = acTab((run << 4) | cat)
            bw.write(c, l)
            bw.write(if (v >= 0) v else v + (1 << cat) - 1, cat)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acTab(0x00); bw.write(c, l) } // EOB
        // single-component scan: MCU = block; restart markers between MCUs
        mcuCount += 1
        if (restartInterval > 0 && mcuCount % restartInterval == 0 &&
            !(by == blocksY - 1 && bx == blocksX - 1)) {
          bw.flush() // byte-align (pad with 1s) before the marker
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          prevDc = 0 // predictors reset at each restart (T.81 §F.2.1.3.1)
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ======================= decoder =======================

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical-code decode via the T.81 §F.2.2.3 min/max-code arrays —
    // per-bit work is two integer compares (the previous (len, code) boxed
    // HashMap lookup per BIT dominated the decoder's profile)
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes of this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        val n = bits(len - 1)
        if (n == 0) { minCode(len) = 0; maxCode(len) = -1; valPtr(len) = k }
        else { minCode(len) = code; maxCode(len) = code + n - 1; valPtr(len) = k; code += n; k += n }
        code <<= 1
        len += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.readBit()
        len += 1
        if (maxCode(len) >= minCode(len) && code >= minCode(len) && code <= maxCode(len))
          return vals(valPtr(len) + (code - minCode(len)))
      }
      throw new IllegalArgumentException("jpeg: bad Huffman code")
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("jpeg: truncated entropy data")
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          // ONLY a stuffed 0x00 is entropy data; a marker here (incl. RSTn,
          // which is legal solely at a restart boundary consumed by
          // readRestart) means the stream and the decoder disagree — fail,
          // never decode garbage pixels
          if (next == 0x00) pos += 1
          else throw new IllegalArgumentException("jpeg: unexpected marker in entropy data")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Consume an expected RSTn at a restart boundary: discard padding bits to
      * the byte edge, skip optional 0xFF fill bytes, verify the marker cycles
      * D0..D7 in order (T.81 §F.2.1.3.1 — callers also reset DC predictors).
      */
    def readRestart(expected: Int): Unit = {
      nbits = 0 // byte-align: rest of the current byte is padding
      while (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
             (data(pos + 1) & 0xff) == 0xff) pos += 1 // fill bytes
      if (pos + 1 >= data.length || (data(pos) & 0xff) != 0xff)
        throw new IllegalArgumentException("jpeg: restart marker expected")
      val m = data(pos + 1) & 0xff
      if (m != 0xd0 + expected)
        throw new IllegalArgumentException(
          f"jpeg: expected RST$expected%d, got 0xff$m%02x — restart markers out of sync")
      pos += 2
    }
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: HuffTable = _
    var acTab: HuffTable = _
    var pred: Int = 0
  }

  def decode(bytes: Array[Byte]): Gray = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val dcTables = scala.collection.mutable.Map.empty[Int, HuffTable]
    val acTables = scala.collection.mutable.Map.empty[Int, HuffTable]
    var width = 0; var height = 0
    var restartInterval = 0
    var comps: Array[Component] = Array.empty

    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    var luma: Array[Byte] = null
    var done = false
    while (!done) {
      if (pos + 1 >= bytes.length) throw new IllegalArgumentException("jpeg: truncated stream")
      if ((bytes(pos) & 0xff) != 0xff) throw new IllegalArgumentException("jpeg: marker expected")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => done = true // EOI
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(f"jpeg: unsupported SOF marker 0xff$m%02x (not baseline)")
        case 0xdb =>
          val len = u16(pos); var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "jpeg: 16-bit quant tables unsupported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            quant(tq) = t
            p += 65
          }
          pos += len
        case 0xc4 =>
          val len = u16(pos); var p = pos + 2
          while (p < pos + len) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + n
          }
          pos += len
        case 0xc0 | 0xc1 =>
          val len = u16(pos)
          require((bytes(pos + 2) & 0xff) == 8, "jpeg: only 8-bit precision supported")
          height = u16(pos + 3); width = u16(pos + 5)
          // same 64-megapixel cap as BMP/GIF/TIFF (long math): a crafted SOF
          // claiming ~46k x 46k must hit the guard, not a ~2 GB luma alloc
          require(width > 0 && height > 0 && width.toLong * height <= 64L * 1024 * 1024,
            "jpeg: dims out of range")
          val n = bytes(pos + 7) & 0xff
          require(n == 1 || n == 3, s"jpeg: $n components unsupported")
          comps = Array.tabulate(n) { i =>
            val b = pos + 8 + i * 3
            Component(bytes(b) & 0xff, (bytes(b + 1) & 0xff) >> 4, bytes(b + 1) & 0x0f, bytes(b + 2) & 0xff)
          }
          comps.foreach(c => require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
            s"jpeg: sampling ${c.h}x${c.v} unsupported"))
          pos += len
        case 0xda =>
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          var p = pos + 3
          var i = 0
          while (i < ns) {
            val cid = bytes(p) & 0xff
            val tabs = bytes(p + 1) & 0xff
            comps.find(_.id == cid).foreach { c =>
              c.dcTab = dcTables(tabs >> 4)
              c.acTab = acTables(tabs & 0x0f)
            }
            p += 2; i += 1
          }
          pos += len
          // entropy-coded scan
          val maxH = comps.map(_.h).max
          val maxV = comps.map(_.v).max
          val mcuW = 8 * maxH
          val mcuH = 8 * maxV
          val mcusX = (width + mcuW - 1) / mcuW
          val mcusY = (height + mcuH - 1) / mcuH
          luma = new Array[Byte](width * height)
          val br = new BitReader(bytes, pos)
          val lumaComp = comps.head
          val block = new Array[Int](64)
          val tmp = new Array[Double](64) // IDCT scratch, hoisted out of the block loop
          var mcuCount = 0
          var rstIdx = 0
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              comps.foreach { c =>
                var bv = 0
                while (bv < c.v) {
                  var bh = 0
                  while (bh < c.h) {
                    // decode one block
                    java.util.Arrays.fill(block, 0)
                    val q = quant(c.tq)
                    val dcCat = c.dcTab.decode(br)
                    val diff = extend(br.receive(dcCat), dcCat)
                    c.pred += diff
                    block(0) = c.pred * q(0)
                    var k = 1
                    var eob = false
                    while (k < 64 && !eob) {
                      val rs = c.acTab.decode(br)
                      val run = rs >> 4
                      val cat = rs & 0x0f
                      if (cat == 0) {
                        if (run == 15) k += 16 else eob = true
                      } else {
                        k += run
                        if (k > 63) throw new IllegalArgumentException("jpeg: AC run overflow")
                        block(Zigzag(k)) = extend(br.receive(cat), cat) * q(Zigzag(k))
                        k += 1
                      }
                    }
                    if (c eq lumaComp) {
                      // separable IDCT (basis tables), then place into the luma plane
                      val ox = (mx * c.h + bh) * 8
                      val oy = (my * c.v + bv) * 8
                      var u0 = 0
                      while (u0 < 8) {
                        var x1 = 0
                        while (x1 < 8) {
                          var s = 0.0
                          var v1 = 0
                          // skipping zero coefficients adds/removes only ±0.0
                          // terms, so the double sum is bit-identical — and
                          // sparse blocks (early EOB) are the common case
                          while (v1 < 8) {
                            val b = block(u0 * 8 + v1)
                            if (b != 0) s += cc(v1) * b * Basis(v1)(x1)
                            v1 += 1
                          }
                          tmp(u0 * 8 + x1) = s
                          x1 += 1
                        }
                        u0 += 1
                      }
                      var y0 = 0
                      while (y0 < 8) {
                        var x0 = 0
                        while (x0 < 8) {
                          var s = 0.0
                          var u = 0
                          while (u < 8) { s += cc(u) * tmp(u * 8 + x0) * Basis(u)(y0); u += 1 }
                          val lum = math.max(0, math.min(255, math.round(0.25 * s + 128).toInt))
                          // luma at max sampling factors places directly;
                          // otherwise each decoded pixel covers an sx×sy patch
                          val sx = maxH / c.h
                          val sy = maxV / c.v
                          if (sx == 1 && sy == 1) {
                            val gx = ox + x0
                            val gy = oy + y0
                            if (gx < width && gy < height)
                              luma(gy * width + gx) = (if (lum < 128) 1 else 0).toByte
                          } else {
                            var ry2 = 0
                            while (ry2 < sy) {
                              var rx2 = 0
                              while (rx2 < sx) {
                                val gx = (ox + x0) * sx + rx2
                                val gy = (oy + y0) * sy + ry2
                                if (gx < width && gy < height)
                                  luma(gy * width + gx) = (if (lum < 128) 1 else 0).toByte
                                rx2 += 1
                              }
                              ry2 += 1
                            }
                          }
                          x0 += 1
                        }
                        y0 += 1
                      }
                    }
                    bh += 1
                  }
                  bv += 1
                }
              }
              // restart boundary: byte-align, verify RSTn order, reset
              // every component's DC predictor — skipping the reset decodes
              // garbage pixels from the first restarted MCU on
              mcuCount += 1
              if (restartInterval > 0 && mcuCount % restartInterval == 0 &&
                  !(my == mcusY - 1 && mx == mcusX - 1)) {
                br.readRestart(rstIdx)
                rstIdx = (rstIdx + 1) % 8
                comps.foreach(_.pred = 0)
              }
              mx += 1
            }
            my += 1
          }
          // skip to EOI
          pos = br.pos
        case 0xdd => // DRI
          val len = u16(pos)
          restartInterval = u16(pos + 2)
          pos += len
        case 0x01 => // standalone marker, no payload
        case rst if rst >= 0xd0 && rst <= 0xd7 => // RSTn, no payload
        case _ =>
          val len = u16(pos)
          pos += len
      }
    }
    require(luma != null && width > 0 && height > 0, "jpeg: no scan decoded")
    Gray(width, height, luma)
  }

  /** (width, height) from the SOF header only — cheap metadata parse.
    * Mirrors the main decode() marker discipline: EOI stops the walk, fill
    * 0xFF bytes and the no-payload markers (TEM, RSTn) are stepped over
    * explicitly — treating them as length-prefixed segments would read a
    * bogus length from following data and skip past the real SOF or run out
    * of bounds (surfacing as an index error instead of "no SOF header").
    */
  def dimensions(bytes: Array[Byte]): (Int, Int) = {
    var pos = 2
    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) throw new IllegalArgumentException("jpeg: marker expected")
      val m = bytes(pos + 1) & 0xff
      if (m == 0xff) pos += 1 // fill byte before a marker
      else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (pos + 8 >= bytes.length) throw new IllegalArgumentException("jpeg: truncated SOF")
        val h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
        val w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
        return (w, h)
      }
      else if (m == 0xd9) throw new IllegalArgumentException("jpeg: no SOF header") // EOI
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2 // no payload
      else {
        if (pos + 3 >= bytes.length) throw new IllegalArgumentException("jpeg: truncated segment")
        pos += 2 + (((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff))
      }
    }
    throw new IllegalArgumentException("jpeg: no SOF header")
  }
}
