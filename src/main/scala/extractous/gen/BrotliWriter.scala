package extractous.gen

import java.io.ByteArrayOutputStream

/** Deterministic test-fixture brotli writer, intentionally NOT a mirror of
  * [[extractous.core.Brotli]]. Emits streams of uncompressed meta-blocks
  * only (RFC 7932 §9.2 ISUNCOMPRESSED) — fully standard-conformant brotli,
  * exactly what `BROTLI_MODE`-off tooling ships for incompressible data.
  * The entropy-coded, context-modeled and dictionary paths of the reader are
  * exercised by BrotliSpec's goldens from the REAL Google encoder; this
  * writer exists so CorpusGen can produce `Content-Encoding: br` payloads at
  * Verify time without shipping binaries (same division of labor as
  * [[ZstdWriter]] vs ZstdSpec).
  */
object BrotliWriter {

  /** One brotli stream holding `data` in uncompressed meta-blocks. */
  def br(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    var acc = 0 // bit accumulator, LSB-first
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      acc |= v << nbits
      nbits += n
      while (nbits >= 8) { out.write(acc & 0xFF); acc >>>= 8; nbits -= 8 }
    }
    def alignZero(): Unit = if (nbits > 0) { out.write(acc & 0xFF); acc = 0; nbits = 0 }
    putBits(0, 1) // WBITS = 16
    var off = 0
    while (off < data.length) {
      val n = math.min(65536, data.length - off)
      putBits(0, 1)      // ISLAST = 0
      putBits(0, 2)      // MNIBBLES code 0 → 4 nibbles
      putBits(n - 1, 16) // MLEN - 1
      putBits(1, 1)      // ISUNCOMPRESSED
      alignZero()        // zero padding to the byte boundary (§9.1)
      out.write(data, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    alignZero()
    out.toByteArray
  }
}
