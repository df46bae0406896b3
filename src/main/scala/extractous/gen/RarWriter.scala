package extractous.gen

import java.io.ByteArrayOutputStream

/** Store-mode RAR 5.0 writer — the fixture emitter for [[extractous.core.Rar]].
  *
  * Engine-independent by design (vints, header CRC coverage, and the file
  * header field order are written straight from the rarlab technote), so the
  * round-trip through the reader is a genuine format check, not a shared
  * misreading: this writer's output is listed AND extracted byte-identically
  * by libarchive 3.8.2 (`bsdtar -x`), which also rejects the
  * header-CRC-excludes-size variant — that third-implementation agreement
  * pinned the CRC coverage (see Rar.scala scaladoc).
  */
object RarWriter {

  private def vint(n0: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(4)
    var n = n0
    var go = true
    while (go) {
      val b = (n & 0x7F).toInt
      n >>>= 7
      if (n != 0) out.write(b | 0x80) else { out.write(b); go = false }
    }
    out.toByteArray
  }

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b)
    c.getValue
  }

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** `uint32 crc | vint size | header` — the CRC covers size + header. */
  private def block(hdr: Array[Byte]): Array[Byte] = {
    val size = vint(hdr.length)
    u32le(crc32(size ++ hdr)) ++ size ++ hdr
  }

  /** A store-mode RAR5 archive of the given (name, bytes) members, in order.
    * `method` forges the compression-info field of the FIRST member (test
    * hook: method ≠ 0 must make the reader refuse, never emit garbage).
    */
  def rar5(members: Seq[(String, Array[Byte])], method: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte]('R', 'a', 'r', '!', 0x1A, 0x07, 0x01, 0x00))
    // main archive header: type 1, no flags, archive flags 0
    out.write(block(vint(1) ++ vint(0) ++ vint(0)))
    members.zipWithIndex.foreach { case ((name, data), idx) =>
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val compInfo = if (idx == 0) (method & 0x7) << 7 else 0
      val hdr = vint(2) ++ vint(0x02) ++ vint(data.length) ++ // type, data-present, dataSize
        vint(0x04) ++ vint(data.length) ++                    // fileFlags: CRC present; unpSize
        vint(0x81A4L) ++                                      // attributes (unix -rw-r--r--)
        u32le(crc32(data)) ++
        vint(compInfo) ++ vint(1) ++                          // compression, host OS unix
        vint(nb.length) ++ nb
      out.write(block(hdr))
      out.write(data)
    }
    // end of archive: type 5, no flags, end flags 0
    out.write(block(vint(5) ++ vint(0) ++ vint(0)))
    out.toByteArray
  }
}
