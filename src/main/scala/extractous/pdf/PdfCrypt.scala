package extractous.pdf

/** Standard security handler (PDF 32000-1:2008 §7.6.3) for
  * encrypted-with-EMPTY-USER-PASSWORD documents — the stratum a crawl
  * actually recovers. Several percent of a real crawl's PDFs are encrypted
  * this way (viewable by anyone, encrypted only to assert permissions); the
  * reference extracts them through Tika/PDFBox
  * (/root/reference/README.md:269-273 format claim, PDF config surface
  * /root/reference/config.go:58-60). Scope: /Filter /Standard with
  * V=1/R=2 (RC4-40) and V=2/R=3 (RC4 up to 128-bit) — the classic
  * crawl-era handlers. AES handlers (V≥4) and non-empty user passwords are
  * rejected with an honest status upstream, never garbage text.
  *
  * All algorithm numbers below cite the published spec; the 32-byte padding
  * string is a spec constant (§7.6.3.3).
  */
object PdfCrypt {

  /** §7.6.3.3 padding constant. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (public algorithm; key ≤ 16 bytes here). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0
    var b = 0
    var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
      k += 1
    }
    out
  }

  def padPwd(pwd: Array[Byte]): Array[Byte] =
    if (pwd.length >= 32) pwd.take(32) else pwd ++ Pad.take(32 - pwd.length)

  private def intLE(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** The parsed /Encrypt parameters this handler supports. */
  final case class StdSecurity(v: Int, r: Int, lengthBits: Int, o: Array[Byte],
      u: Array[Byte], p: Int, id0: Array[Byte]) {
    def keyLen: Int = if (v == 1) 5 else lengthBits / 8
  }

  /** Algorithm 2: file encryption key from the (empty) user password. */
  def fileKey(sec: StdSecurity): Array[Byte] = {
    val n = sec.keyLen
    var d = md5(padPwd(Array.emptyByteArray), sec.o, intLE(sec.p), sec.id0)
    if (sec.r >= 3) {
      var it = 0
      while (it < 50) { d = md5(d.take(n)); it += 1 }
    }
    d.take(n)
  }

  /** Algorithms 4/5 + 6: does the EMPTY user password open this document? */
  def emptyUserPasswordMatches(sec: StdSecurity, key: Array[Byte]): Boolean =
    if (sec.r == 2) java.util.Arrays.equals(rc4(key, Pad), sec.u)
    else {
      var u = md5(Pad, sec.id0)
      u = rc4(key, u)
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      // R≥3 compares only the first 16 bytes (the tail is arbitrary padding)
      java.util.Arrays.equals(u, sec.u.take(16))
    }

  /** §7.6.2 Algorithm 1: per-object key = MD5(fileKey ‖ objnum₃LE ‖ gen₂LE)
    * truncated to min(keyLen + 5, 16).
    */
  def objKey(key: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val ext = new Array[Byte](key.length + 5)
    System.arraycopy(key, 0, ext, 0, key.length)
    ext(key.length) = (num & 0xff).toByte
    ext(key.length + 1) = ((num >> 8) & 0xff).toByte
    ext(key.length + 2) = ((num >> 16) & 0xff).toByte
    ext(key.length + 3) = (gen & 0xff).toByte
    ext(key.length + 4) = ((gen >> 8) & 0xff).toByte
    md5(ext).take(math.min(key.length + 5, 16))
  }
}
