package extractous.gen

import java.io.ByteArrayOutputStream

/** Minimal Zstandard frame writer — the fixture emitter for
  * [[extractous.core.Zstd]]. Emits single-segment frames of raw (and,
  * for constant runs, RLE) blocks with a real XXH64 content checksum:
  * store-mode zstd, exactly what `zstd --no-compress`-class tooling ships.
  * The entropy-coded paths of the reader are exercised by ZstdSpec's
  * embedded REAL-CLI goldens; this writer exists so generator strata can
  * produce `.zst`/`.tar.zst`/`Content-Encoding: zstd` payloads at Verify
  * time without shelling out. Output is accepted byte-identically by the
  * zstd CLI (checked in ZstdSpec where the binary is present).
  */
object ZstdWriter {

  private val BlockMax = 128 * 1024

  private def u32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }

  /** One zstd frame holding `data` in raw/RLE blocks, content size and
    * checksum present.
    */
  def zst(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 64)
    u32le(out, 0xFD2FB528L)
    val fcsFlag =
      if (data.length < 256) 0
      else if (data.length.toLong - 256 < 65536) 1
      else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04) // single-segment + checksum
    fcsFlag match {
      case 0 => out.write(data.length)
      case 1 =>
        val v = data.length - 256
        out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      case _ => u32le(out, data.length.toLong)
    }
    var p = 0
    var emitted = false
    while (p < data.length || !emitted) {
      val n = math.min(BlockMax, data.length - p)
      val last = p + n >= data.length
      var constant = n > 1
      var i = p + 1
      while (constant && i < p + n) { constant = data(i) == data(p); i += 1 }
      if (constant) {
        val bh = (if (last) 1 else 0) | (1 << 1) | (n << 3)
        out.write(bh & 0xFF); out.write((bh >> 8) & 0xFF); out.write((bh >> 16) & 0xFF)
        out.write(data(p))
      } else {
        val bh = (if (last) 1 else 0) | (n << 3)
        out.write(bh & 0xFF); out.write((bh >> 8) & 0xFF); out.write((bh >> 16) & 0xFF)
        out.write(data, p, n)
      }
      p += n
      emitted = true
    }
    u32le(out, extractous.core.Zstd.xxh64low32(data))
    out.toByteArray
  }
}
