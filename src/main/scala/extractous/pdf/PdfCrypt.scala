package extractous.pdf

/** Standard security handler (PDF 32000-1:2008 §7.6.3). Two strata:
  * encrypted-with-EMPTY-USER-PASSWORD documents — viewable by anyone,
  * encrypted only to assert permissions, the stratum a crawl recovers by
  * default (the reference gets these through Tika/PDFBox,
  * /root/reference/README.md:269-273 format claim, PDF config surface
  * /root/reference/config.go:58-60) — and, when the caller supplies
  * `PdfConfig.password`, genuinely password-protected documents: the
  * password is tried as the USER password (Algorithms 2/4/5/6, V5
  * Algorithm 11) and as the OWNER password (Algorithm 7 legacy /O
  * recovery, V5 Algorithm 12 + /OE key unwrap). Scope: /Filter /Standard
  * with V=1/R=2 (RC4-40), V=2/R=3 (RC4 up to 128-bit), V=4/R=4 crypt
  * filters (/CFM /V2 RC4 or /AESV2 AES-128-CBC, §7.6.5) and V=5/R=5,6
  * (/AESV3 AES-256-CBC, §7.6.4.3.3/4 — the PDF-2.0 handler Acrobat 9/X
  * write). Wrong passwords and unknown crypt-filter methods are rejected
  * with an honest status upstream, never garbage text.
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
      u: Array[Byte], p: Int, id0: Array[Byte], encryptMetadata: Boolean = true) {
    def keyLen: Int = if (v == 1) 5 else lengthBits / 8
  }

  /** Algorithm 2: file encryption key from the user password (empty by
    * default — the openable-by-anyone stratum; non-empty when the caller
    * supplies one via PdfConfig.password). R4 with /EncryptMetadata false
    * additionally hashes 0xFFFFFFFF (step f).
    */
  def fileKey(sec: StdSecurity, pwd: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val n = sec.keyLen
    val noMetaTail: Array[Byte] =
      if (sec.r >= 4 && !sec.encryptMetadata) Array.fill(4)(0xff.toByte) else Array.emptyByteArray
    var d = md5(padPwd(pwd), sec.o, intLE(sec.p), sec.id0, noMetaTail)
    if (sec.r >= 3) {
      var it = 0
      while (it < 50) { d = md5(d.take(n)); it += 1 }
    }
    d.take(n)
  }

  /** Algorithm 3 steps a–d: the RC4 key derived from the OWNER password
    * that encrypts /O.
    */
  private def ownerRc4Key(sec: StdSecurity, ownerPwd: Array[Byte]): Array[Byte] = {
    var d = md5(padPwd(ownerPwd))
    if (sec.r >= 3) {
      var it = 0
      while (it < 50) { d = md5(d); it += 1 }
    }
    d.take(sec.keyLen)
  }

  /** Algorithm 7 (owner-password open): decrypt /O with the owner key to
    * recover the PADDED user password, then run Algorithm 2 on it. The
    * caller validates the resulting key against /U as usual — a wrong owner
    * password just yields a key that fails the /U check, never garbage text.
    */
  def fileKeyFromOwner(sec: StdSecurity, ownerPwd: Array[Byte]): Array[Byte] = {
    val ok = ownerRc4Key(sec, ownerPwd)
    var up = sec.o.take(32)
    if (sec.r == 2) up = rc4(ok, up)
    else {
      var i = 19
      while (i >= 0) {
        val xi = i
        up = rc4(ok.map(b => (b ^ xi).toByte), up)
        i -= 1
      }
    }
    // `up` is the user password already padded to 32 bytes; padPwd is the
    // identity on it, so Algorithm 2 applies unchanged.
    fileKey(sec, up)
  }

  /** Algorithms 4/5 + 6: does this candidate file key (derived from some
    * password attempt) open the document — i.e. reproduce /U?
    */
  def userPasswordMatches(sec: StdSecurity, key: Array[Byte]): Boolean =
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
  def objKey(key: Array[Byte], num: Int, gen: Int): Array[Byte] =
    objKeyExt(key, num, gen, aes = false)

  /** Per-object key for /AESV2 crypt filters: same as Algorithm 1 but the
    * MD5 input additionally ends with the spec constant bytes "sAlT"
    * (0x73 0x41 0x6C 0x54 — §7.6.2 Algorithm 1 step b).
    */
  def objKeyAes(key: Array[Byte], num: Int, gen: Int): Array[Byte] =
    objKeyExt(key, num, gen, aes = true)

  private def objKeyExt(key: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val ext = new Array[Byte](key.length + 5 + (if (aes) 4 else 0))
    System.arraycopy(key, 0, ext, 0, key.length)
    ext(key.length) = (num & 0xff).toByte
    ext(key.length + 1) = ((num >> 8) & 0xff).toByte
    ext(key.length + 2) = ((num >> 16) & 0xff).toByte
    ext(key.length + 3) = (gen & 0xff).toByte
    ext(key.length + 4) = ((gen >> 8) & 0xff).toByte
    if (aes) {
      ext(key.length + 5) = 0x73; ext(key.length + 6) = 0x41
      ext(key.length + 7) = 0x6c; ext(key.length + 8) = 0x54
    }
    md5(ext).take(math.min(key.length + 5, 16))
  }

  /** AES-CBC decrypt of the PDF wire format: data = IV(16) ‖ ciphertext,
    * PKCS#7-padded (§7.6.2 "AES... CBC mode with a 16-byte block size and an
    * initialization vector... prepended"). Lenient like PDFBox: undersized
    * or misaligned ciphertext yields empty bytes (a torn object, not a
    * crash), and an implausible final pad byte leaves the last block intact
    * rather than throwing — garbage padding means a wrong key, which the
    * password check upstream already rules out for well-formed files.
    */
  def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return Array.emptyByteArray
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOfRange(data, 0, 16)))
    val plain = cipher.doFinal(data, 16, data.length - 16)
    val pad = plain(plain.length - 1) & 0xff
    if (pad >= 1 && pad <= 16 && pad <= plain.length &&
        (plain.length - pad until plain.length).forall(i => (plain(i) & 0xff) == pad))
      java.util.Arrays.copyOfRange(plain, 0, plain.length - pad)
    else plain
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** §7.6.4.3.4 Algorithm 2.B — the R6 password hash (R5 uses the plain
    * SHA-256 of step 0). `udata` is the 48-byte /U entry when hashing the
    * OWNER password, empty for the user password.
    */
  def hash2b(r: Int, pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    if (r == 5) return k
    val aes = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    var e: Array[Byte] = Array.emptyByteArray
    var round = 0
    while (round < 64 || (e(e.length - 1) & 0xff) > round - 32) {
      val block = new Array[Byte](pwd.length + k.length + udata.length)
      System.arraycopy(pwd, 0, block, 0, pwd.length)
      System.arraycopy(k, 0, block, pwd.length, k.length)
      System.arraycopy(udata, 0, block, pwd.length + k.length, udata.length)
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      aes.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(java.util.Arrays.copyOfRange(k, 0, 16), "AES"),
        new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOfRange(k, 16, 32)))
      e = aes.doFinal(k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = sum % 3 match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case 2 => sha("SHA-512", e)
      }
      round += 1
    }
    java.util.Arrays.copyOfRange(k, 0, 32)
  }

  /** §7.6.4.4.10/11 (Algorithm 11 + 8a): does this user password (empty or
    * caller-supplied UTF-8 bytes; full SASLprep is out of scope — identity
    * for the ASCII passwords a pipeline config carries) open this V5
    * document? /U = hash(32) ‖ validationSalt(8) ‖ keySalt(8).
    */
  def v5UserPasswordMatches(r: Int, u48: Array[Byte], pwd: Array[Byte] = Array.emptyByteArray): Boolean = {
    if (u48.length < 48) return false
    val hash = hash2b(r, pwd,
      java.util.Arrays.copyOfRange(u48, 32, 40), Array.emptyByteArray)
    java.util.Arrays.equals(hash, java.util.Arrays.copyOfRange(u48, 0, 32))
  }

  /** §7.6.4.4.12 (Algorithm 12): does this OWNER password open the V5
    * document? /O = hash(32) ‖ validationSalt(8) ‖ keySalt(8), with the full
    * 48-byte /U as the extra hash input.
    */
  def v5OwnerPasswordMatches(r: Int, o48: Array[Byte], u48: Array[Byte], pwd: Array[Byte]): Boolean = {
    if (o48.length < 48 || u48.length < 48) return false
    val hash = hash2b(r, pwd,
      java.util.Arrays.copyOfRange(o48, 32, 40), java.util.Arrays.copyOfRange(u48, 0, 48))
    java.util.Arrays.equals(hash, java.util.Arrays.copyOfRange(o48, 0, 32))
  }

  /** §7.6.4.3.3 Algorithm 8b: recover the 32-byte file key from /UE with the
    * user password — AES-256-CBC decrypt, zero IV, no padding.
    */
  def v5FileKey(r: Int, u48: Array[Byte], ue: Array[Byte], pwd: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val ikey = hash2b(r, pwd,
      java.util.Arrays.copyOfRange(u48, 40, 48), Array.emptyByteArray)
    val aes = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    aes.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    aes.doFinal(ue, 0, 32)
  }

  /** §7.6.4.3.3 Algorithm 9b analog: recover the file key from /OE with the
    * OWNER password (key salt = /O bytes 40..48, /U as extra hash input).
    */
  def v5FileKeyFromOwner(r: Int, o48: Array[Byte], u48: Array[Byte], oe: Array[Byte], pwd: Array[Byte]): Array[Byte] = {
    val ikey = hash2b(r, pwd,
      java.util.Arrays.copyOfRange(o48, 40, 48), java.util.Arrays.copyOfRange(u48, 0, 48))
    val aes = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    aes.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    aes.doFinal(oe, 0, 32)
  }
}
