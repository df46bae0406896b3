package extractous.ocr

import java.io.ByteArrayOutputStream

/** GIF codec (87a/89a), from scratch — real LZW in both directions.
  *
  * The reference OCRs GIF crawl images through Tika/Tesseract
  * (/root/reference/README.md:271 "Images: PNG, JPEG, TIFF, BMP, GIF (with
  * OCR)"); GIF is the dominant image format of older crawl strata. Decoder
  * covers the shapes those carry: global/local color tables, interlace,
  * extension blocks (skipped), first image frame. Unknown/truncated structure
  * raises — the row fails with a status, never wrong text.
  *
  * Encoder: single-frame GIF89a, 2-color palette (paper white index 0, ink
  * black index 1), non-interlaced, standard LZW with code-size growth and
  * dictionary reset at 4096 — enough to round-trip any [[Gray]] bilevel image
  * exactly (GIF is lossless).
  */
object Gif {

  // ======================= encoder =======================

  def encode(g: Gray): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(g.width); u16(g.height)
    out.write(0x80) // GCT present, 2^(0+1) = 2 entries
    out.write(0)    // background color index
    out.write(0)    // aspect
    out.write(Array[Byte](-1, -1, -1, 0, 0, 0)) // palette: 0=white, 1=black
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(g.width); u16(g.height)
    out.write(0) // no LCT, not interlaced
    val minCode = 2
    out.write(minCode)
    // ---- LZW compress the index stream (LSB-first bit packing) ----
    val clear = 1 << minCode       // 4
    val eoi = clear + 1            // 5
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    val block = new ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) {
        block.write((acc & 0xff).toInt)
        acc >>>= 8; nbits -= 8
        if (block.size == 255) { out.write(255); block.writeTo(out); block.reset() }
      }
    }
    emit(clear)
    var prefix = -1
    var i = 0
    val n = g.width * g.height
    while (i < n) {
      val k = if (g.pixels(i) != 0) 1 else 0
      if (prefix < 0) prefix = k
      else dict.get((prefix, k)) match {
        case Some(c) => prefix = c
        case None =>
          emit(prefix)
          if (nextCode < 4096) {
            dict((prefix, k)) = nextCode
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          } else { // dictionary full: reset (keeps the decoder in lockstep)
            emit(clear)
            dict = scala.collection.mutable.HashMap.empty
            nextCode = eoi + 1
            codeSize = minCode + 1
          }
          prefix = k
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (nbits > 0) { block.write((acc & 0xff).toInt) }
    if (block.size > 0) { out.write(block.size); block.writeTo(out) }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ======================= decoder =======================

  def decode(bytes: Array[Byte]): Gray = {
    require(bytes.length >= 13 &&
      (new String(bytes, 0, 6, "US-ASCII") == "GIF87a" ||
       new String(bytes, 0, 6, "US-ASCII") == "GIF89a"), "not a GIF")
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var pos = 6
    val sw = u16(pos); val sh = u16(pos + 2)
    val packed = bytes(pos + 4) & 0xff
    pos += 7
    var palette: Array[Int] = Array(0xffffff, 0x000000)
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07)
      palette = Array.tabulate(n)(i =>
        ((bytes(pos + i * 3) & 0xff) << 16) | ((bytes(pos + i * 3 + 1) & 0xff) << 8) | (bytes(pos + i * 3 + 2) & 0xff))
      pos += n * 3
    }
    require(sw > 0 && sh > 0 && sw.toLong * sh <= 64L * 1024 * 1024, "GIF dims out of range")
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (pos < bytes.length && bytes(pos) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x3b => throw new IllegalArgumentException("gif: trailer before image data")
        case 0x2c =>
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          pos += 10
          var pal = palette
          if ((ipacked & 0x80) != 0) { // local color table
            val n = 2 << (ipacked & 0x07)
            pal = Array.tabulate(n)(i =>
              ((bytes(pos + i * 3) & 0xff) << 16) | ((bytes(pos + i * 3 + 1) & 0xff) << 8) | (bytes(pos + i * 3 + 2) & 0xff))
            pos += n * 3
          }
          val interlaced = (ipacked & 0x40) != 0
          require(iw > 0 && ih > 0 && iw.toLong * ih <= 64L * 1024 * 1024, "GIF frame out of range")
          val minCode = bytes(pos) & 0xff
          require(minCode >= 2 && minCode <= 8, s"gif: bad LZW min code size $minCode")
          pos += 1
          // concatenate data sub-blocks
          val data = new ByteArrayOutputStream()
          while (pos < bytes.length && bytes(pos) != 0) {
            val len = bytes(pos) & 0xff
            require(pos + 1 + len <= bytes.length, "gif: truncated sub-block")
            data.write(bytes, pos + 1, len)
            pos += 1 + len
          }
          val indices = lzwDecode(data.toByteArray, minCode, iw * ih)
          // palette entry → ink by luminance (<128 gray is ink)
          val ink = pal.map { rgb =>
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
            if (lum < 128) 1.toByte else 0.toByte
          }
          val px = new Array[Byte](iw * ih)
          if (!interlaced) {
            var i = 0
            while (i < px.length) { px(i) = ink(indices(i) % ink.length); i += 1 }
          } else {
            // 4-pass interlace: rows 0,8,16… then 4,12… then 2,6… then 1,3…
            val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
            var src = 0
            passes.foreach { case (start, step) =>
              var y = start
              while (y < ih) {
                var x = 0
                while (x < iw) { px(y * iw + x) = ink(indices(src) % ink.length); src += 1; x += 1 }
                y += step
              }
            }
          }
          return Gray(iw, ih, px)
        case other =>
          throw new IllegalArgumentException(f"gif: unknown block 0x$other%02x")
      }
    }
    throw new IllegalArgumentException("gif: no image data")
  }

  /** GIF-flavor LZW decode (LSB-first, growing code size, clear/EOI). */
  private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var codeSize = minCode + 1
    // dictionary as (prefix link, tail byte); roots are their own value
    val prefixOf = new Array[Int](4096)
    val tailOf = new Array[Int](4096)
    var nextCode = eoi + 1
    val out = new Array[Int](expected)
    var outPos = 0
    var acc = 0L
    var nbits = 0
    var pos = 0
    var prev = -1
    val buf = new Array[Int](4096)
    def expand(code: Int): Int = { // writes the string for `code` into buf, returns length
      var c = code
      var len = 0
      while (c >= clear + 2) { buf(len) = tailOf(c); len += 1; c = prefixOf(c) }
      buf(len) = c; len += 1
      len
    }
    while (outPos < expected) {
      while (nbits < codeSize) {
        if (pos >= data.length) throw new IllegalArgumentException("gif: truncated LZW stream")
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; nbits -= codeSize
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        if (outPos != expected) throw new IllegalArgumentException("gif: EOI before all pixels")
        return out
      } else {
        if (code > nextCode || (code == nextCode && prev < 0))
          throw new IllegalArgumentException("gif: corrupt LZW code")
        var len = 0
        var first = 0
        if (code == nextCode) { // KwKwK case
          len = expand(prev)
          first = buf(len - 1)
          // emit prev's string + its first char
          var i = len - 1
          while (i >= 0) { if (outPos < expected) { out(outPos) = buf(i); outPos += 1 }; i -= 1 }
          if (outPos < expected) { out(outPos) = first; outPos += 1 }
        } else {
          len = expand(code)
          first = buf(len - 1)
          var i = len - 1
          while (i >= 0) { if (outPos < expected) { out(outPos) = buf(i); outPos += 1 }; i -= 1 }
        }
        if (prev >= 0 && nextCode < 4096) {
          prefixOf(nextCode) = prev
          tailOf(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }
}
