package extractous.gen

import java.io.ByteArrayOutputStream

/** From-scratch framed-Snappy fixture compressor (greedy hash-table matcher
  * emitting literals + 2-byte-offset copies over the public block format,
  * chunked per the framing spec with masked CRC32C). DELIBERATELY
  * independent of the reader (`extractous.core.Snappy`); SnappySpec
  * additionally cross-checks both sides against the Apache commons-compress
  * reference implementation, so neither can drift from the spec unnoticed.
  */
object SnappyWriter {

  private def maskedCrc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** One raw snappy block: varint preamble + elements. Copies use the
    * 2-byte-offset form (len capped at 64, re-emitted for longer matches) —
    * always spec-legal where a match exists.
    */
  private def rawCompress(src: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val n = to - from
    val out = new ByteArrayOutputStream(n + 8)
    // varint uncompressed length
    var v = n
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def emitLiterals(a: Int, b: Int): Unit = {
      var p = a
      while (p < b) {
        val run = math.min(b - p, 65536) // one length-extended literal ≤ 64 KiB
        if (run <= 60) out.write(((run - 1) << 2))
        else if (run <= 256) { out.write(60 << 2 | 0); out.write(run - 1) }
        else { out.write(61 << 2 | 0); out.write((run - 1) & 0xff); out.write(((run - 1) >>> 8) & 0xff) }
        out.write(src, p, run)
        p += run
      }
    }
    def emitCopy(offset: Int, len0: Int): Unit = {
      var len = len0
      while (len > 0) {
        val take = if (len > 64) math.min(len - 4, 64) else len // never leave a tail < 4
        out.write(((take - 1) << 2) | 0x02)
        out.write(offset & 0xff); out.write((offset >>> 8) & 0xff)
        len -= take
      }
    }
    if (n < 4) { emitLiterals(from, to); return out.toByteArray }
    def rd4(p: Int) = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) | ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
    val bits = 13
    val table = new Array[Int](1 << bits)
    java.util.Arrays.fill(table, -1)
    def hash(x: Int) = (x * 0x9E3779B1) >>> (32 - bits)
    var anchor = from
    var p = from
    while (p + 4 <= to) {
      val x = rd4(p)
      val h = hash(x)
      val cand = table(h)
      table(h) = p
      if (cand >= from && p - cand <= 0xffff && rd4(cand) == x) {
        var ml = 4
        while (p + ml < to && src(cand + ml) == src(p + ml)) ml += 1
        emitLiterals(anchor, p)
        emitCopy(p - cand, ml)
        p += ml
        anchor = p
      } else p += 1
    }
    emitLiterals(anchor, to)
    out.toByteArray
  }

  /** A framed `.sz` payload: sNaPpY identifier + 64 KiB chunks, each
    * compressed (or stored uncompressed when the greedy pass expands it),
    * with masked CRC32C of the uncompressed data.
    */
  def sz(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    out.write(Array(0xff, 0x06, 0x00, 0x00, 's', 'N', 'a', 'P', 'p', 'Y').map(_.toByte))
    var p = 0
    if (data.isEmpty) return out.toByteArray
    while (p < data.length) {
      val to = math.min(p + 65536, data.length)
      val crc = maskedCrc32c(data, p, to - p)
      val comp = rawCompress(data, p, to)
      val (typ, payloadLen) =
        if (comp.length < to - p) (0x00, comp.length) else (0x01, to - p)
      val len = payloadLen + 4
      out.write(typ)
      out.write(len & 0xff); out.write((len >>> 8) & 0xff); out.write((len >>> 16) & 0xff)
      out.write(crc & 0xff); out.write((crc >>> 8) & 0xff)
      out.write((crc >>> 16) & 0xff); out.write((crc >>> 24) & 0xff)
      if (typ == 0x00) out.write(comp, 0, comp.length) else out.write(data, p, to - p)
      p = to
    }
    out.toByteArray
  }
}
