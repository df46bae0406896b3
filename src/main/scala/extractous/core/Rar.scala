package extractous.core

/** RAR 5.0 container walker — store-mode members only.
  *
  * The RAR5 on-disk layout (rarlab technote "RAR 5.0 archive format"):
  * 8-byte signature `Rar!\x1A\x07\x01\x00`, then a sequence of blocks
  * `uint32 headerCRC32 | vint headerSize | header[headerSize] | data[*]`
  * where the CRC covers the headerSize vint PLUS the header bytes (pinned
  * empirically: libarchive/bsdtar accepts exactly this coverage and rejects
  * the header-only variant with "Header CRC error"), vints are little-endian
  * base-128 with bit 7 as continuation, and a header is
  * `vint type | vint flags | [vint extraSize] | [vint dataSize] | ...`.
  *
  * Reference scope (`/root/reference/README.md:269-273` claims RAR via
  * Tika): RAR *compression* (methods 1–5) is a proprietary algorithm with no
  * published specification, so compressed members REFUSE with a typed
  * status — never garbage — while store-mode members (method 0, what
  * `rar a -m0` writes) extract fully, CRC-checked at both the header and
  * data level. RAR4 (`Rar!\x1A\x07\x00`) stays a detection-only refusal.
  * Fixtures come from the independent [[extractous.gen.RarWriter]], whose
  * output bsdtar (libarchive 3.8.2) lists and extracts byte-identically —
  * the same writer-vs-third-implementation proof chain Bzip2Spec documents.
  */
object Rar {

  /** Total decompressed member budget (store mode cannot amplify, but a
    * forged dataSize must not buy an unbounded allocation either).
    */
  private val MaxTotalBytes = 256L * 1024 * 1024
  private val MaxMembers = 10000

  def isRar5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == 'R' && bytes(1) == 'a' && bytes(2) == 'r' &&
      bytes(3) == '!' && bytes(4) == 0x1A && bytes(5) == 0x07 &&
      bytes(6) == 0x01 && bytes(7) == 0x00

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = BinUtil.crc32(b, off, len)

  private def u32le(b: Array[Byte], off: Int): Long = BinUtil.u32le(b, off)

  /** Little-endian base-128 vint at `off`; returns (value, bytesConsumed).
    * Caps at 9 bytes / 63 bits — a longer encoding is structural corruption.
    */
  private def vint(b: Array[Byte], off: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = off
    while (i < end && shift <= 56) {
      val x = b(i) & 0xFF
      v |= (x & 0x7FL) << shift
      i += 1
      if ((x & 0x80) == 0) return (v, i - off)
      shift += 7
    }
    throw new IllegalArgumentException("rar: unterminated vint")
  }

  /** Ordered (name, bytes) members of a RAR5 archive. Throws
    * [[UnsupportedArchiveException]] for compressed/encrypted content and
    * `IllegalArgumentException` for structural corruption — callers map
    * both to typed statuses.
    */
  def members(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (!isRar5(bytes)) {
      if (SevenZip.looksLikeRar(bytes))
        throw new UnsupportedArchiveException("RAR4 archive (detection-only rung)")
      throw new IllegalArgumentException("rar: bad signature")
    }
    val out = Vector.newBuilder[(String, Array[Byte])]
    var total = 0L
    var count = 0
    var p = 8
    var done = false
    while (!done) {
      if (p + 5 > bytes.length) throw new IllegalArgumentException("rar: truncated block header")
      val storedCrc = u32le(bytes, p)
      val (hdrSize, sizeLen) = vint(bytes, p + 4, bytes.length)
      val hdrStart = p + 4 + sizeLen
      if (hdrSize <= 0 || hdrSize > bytes.length - hdrStart)
        throw new IllegalArgumentException("rar: header overruns file")
      val hdrEnd = hdrStart + hdrSize.toInt
      if (crc32(bytes, p + 4, sizeLen + hdrSize.toInt) != storedCrc)
        throw new IllegalArgumentException("rar: header CRC mismatch")
      var q = hdrStart
      val (htype, tl) = vint(bytes, q, hdrEnd); q += tl
      val (hflags, fl) = vint(bytes, q, hdrEnd); q += fl
      if ((hflags & 0x01) != 0) { val (_, el) = vint(bytes, q, hdrEnd); q += el }
      var dataSize = 0L
      if ((hflags & 0x02) != 0) { val (ds, dl) = vint(bytes, q, hdrEnd); q += dl; dataSize = ds }
      if (dataSize < 0 || dataSize > bytes.length - hdrEnd)
        throw new IllegalArgumentException("rar: data area overruns file")
      htype match {
        case 1 => // main archive header — nothing we need
        case 4 =>
          throw new UnsupportedArchiveException("encrypted archive")
        case 5 =>
          done = true
        case 2 =>
          val (fileFlags, ffl) = vint(bytes, q, hdrEnd); q += ffl
          val (unpSize, ul) = vint(bytes, q, hdrEnd); q += ul
          val (_, al) = vint(bytes, q, hdrEnd); q += al // attributes
          if ((fileFlags & 0x02) != 0) q += 4 // mtime
          var dataCrc = -1L
          if ((fileFlags & 0x04) != 0) {
            if (q + 4 > hdrEnd) throw new IllegalArgumentException("rar: file header truncated")
            dataCrc = u32le(bytes, q); q += 4
          }
          val (compInfo, cl) = vint(bytes, q, hdrEnd); q += cl
          val (_, ol) = vint(bytes, q, hdrEnd); q += ol // host OS
          val (nameLen, nl) = vint(bytes, q, hdrEnd); q += nl
          if (nameLen < 0 || nameLen > hdrEnd - q)
            throw new IllegalArgumentException("rar: name overruns header")
          val name = new String(bytes, q, nameLen.toInt, java.nio.charset.StandardCharsets.UTF_8)
          val isDir = (fileFlags & 0x01) != 0
          if (!isDir) {
            val version = compInfo & 0x3F
            val method = (compInfo >> 7) & 0x7
            if (version != 0)
              throw new UnsupportedArchiveException(s"algorithm version $version")
            if (method != 0)
              throw new UnsupportedArchiveException(
                s"compressed member '$name' (method $method) — store-mode only")
            if ((fileFlags & 0x08) == 0 && unpSize != dataSize)
              throw new IllegalArgumentException("rar: store-mode size mismatch")
            total += dataSize
            count += 1
            if (total > MaxTotalBytes || count > MaxMembers)
              throw new IllegalArgumentException("rar: member budget exceeded")
            val data = java.util.Arrays.copyOfRange(bytes, hdrEnd, hdrEnd + dataSize.toInt)
            if (dataCrc >= 0 && crc32(data, 0, data.length) != dataCrc)
              throw new IllegalArgumentException(s"rar: data CRC mismatch in '$name'")
            out += name -> data
          }
        case 3 => // service header (comment, quick-open, …) — skip with its data
        case _ =>
          if ((hflags & 0x04) == 0) // not skip-if-unknown
            throw new IllegalArgumentException(s"rar: unknown block type $htype")
      }
      p = hdrEnd + dataSize.toInt
      if (!done && p >= bytes.length)
        throw new IllegalArgumentException("rar: missing end-of-archive block")
    }
    out.result()
  }
}
