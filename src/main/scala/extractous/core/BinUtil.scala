package extractous.core

/** Byte-level helpers shared by the archive/container walkers (RAR, 7z, XZ)
  * so a future fix or perf change lands once instead of drifting across
  * three private copies.
  */
private[core] object BinUtil {

  /** CRC-32 (ISO 3309 / zlib polynomial) of `len` bytes at `off`. */
  def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  /** Little-endian unsigned 32-bit read, widened to Long. */
  def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
}
