package extractous.ocr

/** Baseline TIFF codec, from scratch — the shapes scanned-document corpora
  * actually carry (reference capability: /root/reference/README.md:271 lists
  * TIFF among the OCR image formats).
  *
  * Decoder: both byte orders (II/MM), grayscale 8-bit and bilevel 1-bit,
  * PhotometricInterpretation 0 (WhiteIsZero) and 1 (BlackIsZero), Compression
  * 1 (none) and 32773 (PackBits), multi-strip. Anything else (LZW/CCITT/JPEG-
  * in-TIFF, tiles, palettes) raises — the row fails with a status, never
  * wrong text.
  *
  * Encoder: little-endian, single-strip 8-bit BlackIsZero, optionally
  * PackBits-compressed (bilevel rows are long runs — PackBits halves them,
  * and it gives the decoder's compressed path an in-repo producer).
  */
object Tiff {

  def encode(g: Gray): Array[Byte] = encode(g, packBits = false)

  def encode(g: Gray, packBits: Boolean): Array[Byte] = {
    // samples: ink → 0 (black), paper → 255 under BlackIsZero
    val raw = new Array[Byte](g.width * g.height)
    var i = 0
    while (i < raw.length) { raw(i) = if (g.pixels(i) != 0) 0 else -1; i += 1 }
    val data = if (packBits) packBitsEncode(raw, g.width) else raw
    val nEntries = 8
    val ifdOff = 8
    val dataOff = ifdOff + 2 + nEntries * 12 + 4
    val out = java.nio.ByteBuffer.allocate(dataOff + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit =
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    entry(256, 3, 1, g.width)                         // ImageWidth
    entry(257, 3, 1, g.height)                        // ImageLength
    entry(258, 3, 1, 8)                               // BitsPerSample
    entry(259, 3, 1, if (packBits) 32773 else 1)      // Compression
    entry(262, 3, 1, 1)                               // Photometric: BlackIsZero
    entry(273, 4, 1, dataOff)                         // StripOffsets
    entry(278, 3, 1, g.height)                        // RowsPerStrip
    entry(279, 4, 1, data.length)                     // StripByteCounts
    out.putInt(0) // next IFD
    out.put(data)
    out.array()
  }

  /** PackBits per row (the spec requires runs not to cross row boundaries). */
  private def packBitsEncode(raw: Array[Byte], width: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var row = 0
    while (row * width < raw.length) {
      val start = row * width
      var i = start
      val end = start + width
      while (i < end) {
        // find run of equal bytes
        var j = i + 1
        while (j < end && raw(j) == raw(i) && j - i < 128) j += 1
        if (j - i >= 2) {
          out.write(-(j - i - 1)) // replicate run: count byte 1-n as negative
          out.write(raw(i))
          i = j
        } else {
          // literal run until the next ≥2 repeat (max 128)
          var k = i + 1
          while (k < end && k - i < 128 && !(k + 1 < end && raw(k) == raw(k + 1))) k += 1
          out.write(k - i - 1)
          out.write(raw, i, k - i)
          i = k
        }
      }
      row += 1
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Gray = {
    require(bytes.length >= 8, "not a TIFF")
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    require(le || be, "not a TIFF")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    require(bb.getShort(2) == 42, "tiff: bad magic")
    val ifdOff = bb.getInt(4)
    require(ifdOff >= 8 && ifdOff + 2 <= bytes.length, "tiff: bad IFD offset")
    val n = bb.getShort(ifdOff) & 0xffff
    var width = 0; var height = 0; var bps = 1; var comp = 1; var photo = 1
    var rowsPerStrip = Int.MaxValue
    var stripOffsets: Array[Int] = null
    var stripCounts: Array[Int] = null
    def valueOf(typ: Int, count: Int, at: Int, idx: Int): Int = typ match {
      case 3 => // SHORT: up to 2 inline, else offset
        if (count <= 2) bb.getShort(at + idx * 2) & 0xffff
        else bb.getShort(bb.getInt(at) + idx * 2) & 0xffff
      case 4 => if (count <= 1) bb.getInt(at) else bb.getInt(bb.getInt(at) + idx * 4)
      case _ => throw new IllegalArgumentException(s"tiff: unsupported field type $typ")
    }
    var e = 0
    while (e < n) {
      val base = ifdOff + 2 + e * 12
      val tag = bb.getShort(base) & 0xffff
      val typ = bb.getShort(base + 2) & 0xffff
      val count = bb.getInt(base + 4)
      val vAt = base + 8
      tag match {
        case 256 => width = valueOf(typ, count, vAt, 0)
        case 257 => height = valueOf(typ, count, vAt, 0)
        case 258 => bps = valueOf(typ, count, vAt, 0)
        case 259 => comp = valueOf(typ, count, vAt, 0)
        case 262 => photo = valueOf(typ, count, vAt, 0)
        case 273 => stripOffsets = Array.tabulate(count)(i => valueOf(typ, count, vAt, i))
        case 278 => rowsPerStrip = valueOf(typ, count, vAt, 0)
        case 279 => stripCounts = Array.tabulate(count)(i => valueOf(typ, count, vAt, i))
        case _ => // ignore ancillary tags
      }
      e += 1
    }
    require(width > 0 && height > 0 && width.toLong * height <= 64L * 1024 * 1024, "tiff: dims out of range")
    require(bps == 1 || bps == 8, s"tiff: unsupported BitsPerSample $bps")
    require(comp == 1 || comp == 32773, s"tiff: unsupported compression $comp")
    require(photo == 0 || photo == 1, s"tiff: unsupported photometric $photo")
    require(stripOffsets != null && stripCounts != null &&
      stripOffsets.length == stripCounts.length, "tiff: missing strip layout")
    // concatenate decoded strips
    val rowBytes = if (bps == 8) width else (width + 7) / 8
    val raw = new java.io.ByteArrayOutputStream(rowBytes * height)
    var s = 0
    while (s < stripOffsets.length) {
      val off = stripOffsets(s)
      val cnt = stripCounts(s)
      require(off >= 0 && cnt >= 0 && off + cnt <= bytes.length, "tiff: strip out of range")
      if (comp == 1) raw.write(bytes, off, cnt)
      else raw.write(packBitsDecode(bytes, off, cnt))
      s += 1
    }
    val data = raw.toByteArray
    require(data.length >= rowBytes * height, "tiff: truncated pixel data")
    val px = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v =
          if (bps == 8) data(y * rowBytes + x) & 0xff
          else ((data(y * rowBytes + x / 8) >> (7 - x % 8)) & 1) * 255
        // photometric 1 (BlackIsZero): low = black = ink; 0 inverts
        val dark = if (photo == 1) v < 128 else v >= 128
        px(y * width + x) = if (dark) 1 else 0
        x += 1
      }
      y += 1
    }
    Gray(width, height, px)
  }

  private def packBitsDecode(bytes: Array[Byte], off: Int, cnt: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = off
    val end = off + cnt
    while (i < end) {
      val n = bytes(i)
      i += 1
      if (n >= 0) { // n+1 literal bytes
        require(i + n + 1 <= end, "tiff: packbits literal overrun")
        out.write(bytes, i, n + 1)
        i += n + 1
      } else if (n != -128) { // replicate next byte 1-n times
        require(i < end, "tiff: packbits run overrun")
        val v = bytes(i)
        i += 1
        var k = 0
        while (k < 1 - n) { out.write(v); k += 1 }
      } // -128: no-op
    }
    out.toByteArray
  }
}
