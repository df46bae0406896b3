package extractous.gen

import java.io.ByteArrayOutputStream

/** From-scratch LZ4 fixture compressor — greedy hash-table match finder over
  * the public block format, framed per the lz4 Frame Format spec (64 KiB
  * independent blocks, content checksum). DELIBERATELY independent of the
  * reader (`extractous.core.Lz4`): the encode→decode round-trip is a genuine
  * two-implementation check, and Lz4Spec additionally feeds these frames to
  * the REAL `lz4` CLI (and decodes CLI output back) so neither side can
  * drift from the spec unnoticed. Honors the spec's end-of-block
  * restrictions (no match in the last 12 bytes, ≥5 trailing literals) so
  * reference decoders accept the output.
  */
object Lz4Writer {

  private def xxh32(b: Array[Byte], off: Int, len: Int): Int = {
    // writer-side copy of the public XXH32 (independent of core.Xxh32)
    val P1 = 0x9E3779B1; val P2 = 0x85EBCA77; val P3 = 0xC2B2AE3D
    val P4 = 0x27D4EB2F; val P5 = 0x165667B1
    def rd(p: Int) = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    var p = off; val end = off + len
    var h =
      if (len >= 16) {
        var v1 = P1 + P2; var v2 = P2; var v3 = 0; var v4 = -P1
        while (p <= end - 16) {
          v1 = Integer.rotateLeft(v1 + rd(p) * P2, 13) * P1; p += 4
          v2 = Integer.rotateLeft(v2 + rd(p) * P2, 13) * P1; p += 4
          v3 = Integer.rotateLeft(v3 + rd(p) * P2, 13) * P1; p += 4
          v4 = Integer.rotateLeft(v4 + rd(p) * P2, 13) * P1; p += 4
        }
        Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
          Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
      } else P5
    h += len
    while (p + 4 <= end) { h = Integer.rotateLeft(h + rd(p) * P3, 17) * P4; p += 4 }
    while (p < end) { h = Integer.rotateLeft(h + (b(p) & 0xff) * P5, 11) * P1; p += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  private def writeIntLE(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff); o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }

  /** Compress one block (≤ 64 KiB of input); returns null when the greedy
    * pass expands the data (caller stores the block raw — the frame format's
    * high-bit escape).
    */
  private def compressBlock(src: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream((to - from) + 16)
    val n = to - from
    def rd4(p: Int) = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) | ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
    def emit(litFrom: Int, litTo: Int, offset: Int, matchLen: Int): Unit = {
      val litLen = litTo - litFrom
      val litNib = math.min(litLen, 15)
      val matNib = if (matchLen >= 0) math.min(matchLen - 4, 15) else 0
      out.write((litNib << 4) | matNib)
      if (litNib == 15) {
        var rest = litLen - 15
        while (rest >= 255) { out.write(255); rest -= 255 }
        out.write(rest)
      }
      out.write(src, litFrom, litLen)
      if (matchLen >= 0) {
        out.write(offset & 0xff); out.write((offset >>> 8) & 0xff)
        if (matNib == 15) {
          var rest = matchLen - 4 - 15
          while (rest >= 255) { out.write(255); rest -= 255 }
          out.write(rest)
        }
      }
    }
    if (n < 13) { emit(from, to, 0, -1); return checkSize(out, n) }
    val bits = 13
    val table = new Array[Int](1 << bits)
    java.util.Arrays.fill(table, -1)
    def hash(x: Int) = (x * 0x9E3779B1) >>> (32 - bits)
    val mfLimit = to - 12  // spec: last match must start ≥12 bytes from end
    val matchCap = to - 5  // spec: ≥5 trailing literals
    var anchor = from
    var p = from
    while (p <= mfLimit) {
      val v = rd4(p)
      val h = hash(v)
      val cand = table(h)
      table(h) = p
      if (cand >= from && p - cand <= 0xffff && rd4(cand) == v) {
        var ml = 4
        while (p + ml < matchCap && src(cand + ml) == src(p + ml)) ml += 1
        emit(anchor, p, p - cand, ml)
        p += ml
        anchor = p
      } else p += 1
    }
    emit(anchor, to, 0, -1)
    checkSize(out, n)
  }

  private def checkSize(out: ByteArrayOutputStream, rawLen: Int): Array[Byte] = {
    val b = out.toByteArray
    if (b.length >= rawLen) null else b
  }

  /** `.lz4` frame: 64 KiB independent blocks, content checksum (the CLI
    * default posture), incompressible blocks stored with the high-bit flag.
    */
  def lz4(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    writeIntLE(out, 0x184D2204)
    val flg = 0x64 // version 01, block-independent, content checksum
    val bd = 0x40  // 64 KiB max block
    val desc = Array(flg.toByte, bd.toByte)
    out.write(flg); out.write(bd)
    out.write((xxh32(desc, 0, 2) >>> 8) & 0xff)
    var p = 0
    while (p < data.length) {
      val to = math.min(p + 65536, data.length)
      val comp = compressBlock(data, p, to)
      if (comp == null) {
        writeIntLE(out, (to - p) | 0x80000000)
        out.write(data, p, to - p)
      } else {
        writeIntLE(out, comp.length)
        out.write(comp, 0, comp.length)
      }
      p = to
    }
    writeIntLE(out, 0) // EndMark
    writeIntLE(out, xxh32(data, 0, data.length))
    out.toByteArray
  }
}
