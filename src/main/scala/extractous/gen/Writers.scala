package extractous.gen

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream, Deflater, CRC32}

/** Deterministic minimal-format writers used by the corpus generator. These are
  * engine-independent (they never call the parsers), so round-trip tests are a
  * genuine oracle: generator knows what text it embedded, parsers must recover
  * it byte-identically.
  */
object PdfWriter {

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case '\\' => sb.append("\\\\")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  /** Public aliases for [[PdfEncWriter]] (same file assembly, different
    * object bodies).
    */
  def deflateBytes(data: Array[Byte]): Array[Byte] = deflate(data)
  def assembleObjects(objects: Seq[Array[Byte]], trailerExtra: String): Array[Byte] = assemble(objects, trailerExtra)

  /** Assemble objects into a PDF 1.5+ file whose ONLY cross-reference is an
    * XRef STREAM (no `xref` table, no `trailer` keyword anywhere): the
    * trailer entries (/Root /Encrypt /ID /Size) live in the stream's own
    * dict per ISO 32000 §7.5.8. Acrobat 6+ writes most files this way — the
    * shape that catches a reader that only hunts the `trailer` keyword.
    * The entry data is honest /W [1 4 1] type/offset/gen triples.
    */
  def assembleObjectsXrefStream(objects: Seq[Array[Byte]], trailerExtra: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    val offsets = new Array[Int](objects.length + 1)
    objects.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.size()
      w(s"${i + 1} 0 obj\n")
      out.write(body)
      w("\nendobj\n")
    }
    val xrefNum = objects.length + 1
    val xrefPos = out.size()
    val entries = new ByteArrayOutputStream()
    def entry(t: Int, off: Int, g: Int): Unit = {
      entries.write(t)
      entries.write((off >> 24) & 0xff); entries.write((off >> 16) & 0xff)
      entries.write((off >> 8) & 0xff); entries.write(off & 0xff)
      entries.write(g)
    }
    entry(0, 0, 255)
    (1 to objects.length).foreach(i => entry(1, offsets(i), 0))
    entry(1, xrefPos, 0) // the XRef stream object itself
    val data = entries.toByteArray
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 4 1] /Index [0 ${xrefNum + 1}] " +
      s"$trailerExtra /Length ${data.length} >>\nstream\n")
    out.write(data)
    w(s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Assemble objects (1-based bodies, ASCII or binary) into a PDF file with a
    * classic xref table and trailer.
    */
  private def assemble(objects: Seq[Array[Byte]], trailerExtra: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objects.length + 1)
    objects.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.size()
      w(s"${i + 1} 0 obj\n")
      out.write(body)
      w("\nendobj\n")
    }
    val xrefPos = out.size()
    w(s"xref\n0 ${objects.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objects.length).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objects.length + 1} $trailerExtra >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  private def streamObj(dict: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"<< $dict /Length ${data.length} >>\nstream\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(data)
    out.write("\nendstream".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** Digital PDF: one page, lines of text top-down at 14pt leading; optional
    * annotation; optional Flate-compressed content; optional marked content.
    */
  def textPdf(lines: Seq[String], title: String, annot: Option[String],
      compress: Boolean, markedContent: Boolean): Array[Byte] = {
    val content = {
      val sb = new StringBuilder
      sb.append("BT /F1 12 Tf 72 720 Td\n")
      if (markedContent) sb.append("/P << /MCID 0 >> BDC\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("0 -14 Td\n")
        sb.append("(").append(esc(l)).append(") Tj\n")
      }
      if (markedContent) sb.append("EMC\n")
      sb.append("ET")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val (filter, data) = if (compress) (" /Filter /FlateDecode", deflate(content)) else ("", content)
    val annotRef = if (annot.isDefined) " /Annots [6 0 R]" else ""
    val objs = Seq.newBuilder[Array[Byte]]
    objs += "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII")
    objs += "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII")
    objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R$annotRef >>".getBytes("US-ASCII")
    objs += streamObj(filter.trim match { case "" => ""; case f => f }, data)
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>".getBytes("US-ASCII")
    annot.foreach(a => objs += s"<< /Type /Annot /Subtype /Text /Rect [100 100 200 120] /Contents (${esc(a)}) >>".getBytes("US-ASCII"))
    val infoNum = if (annot.isDefined) 7 else 6
    objs += s"<< /Title (${esc(title)}) /Producer (extractous-spark-gen) >>".getBytes("US-ASCII")
    assemble(objs.result(), s"/Root 1 0 R /Info $infoNum 0 R")
  }

  /** Scanned PDF: one page whose content is a single image XObject `Do` with no
    * text operators — forces the OCR branch under PdfOcrStrategy.Auto.
    */
  def scannedPdf(imageBytes: Array[Byte]): Array[Byte] = {
    val content = "q 468 0 0 648 72 72 cm /Im0 Do Q".getBytes("US-ASCII")
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII"),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII"),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>".getBytes("US-ASCII"),
      streamObj("", content),
      streamObj("/Subtype /Image /Width 100 /Height 100 /BitsPerComponent 8 /ColorSpace /DeviceRGB", imageBytes))
    assemble(objs, "/Root 1 0 R")
  }

  /** PDF whose page draws each of `images` `drawsPerImage` times (distinct
    * XObjects, repeated `Do` operators) — probes inline-image extraction and
    * the unique-images-only digest dedup (reference config.go:133-167).
    */
  def multiImagePdf(images: Seq[Array[Byte]], drawsPerImage: Int): Array[Byte] = {
    val n = images.length
    val content = {
      val sb = new StringBuilder
      for (_ <- 0 until drawsPerImage; i <- 0 until n)
        sb.append(s"q 100 0 0 100 ${72 + i * 110} 500 cm /Im$i Do Q\n")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val xobjRefs = (0 until n).map(i => s"/Im$i ${5 + i} 0 R").mkString(" ")
    val objs = Seq.newBuilder[Array[Byte]]
    objs += "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII")
    objs += "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII")
    objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /XObject << $xobjRefs >> >> /Contents 4 0 R >>".getBytes("US-ASCII")
    objs += streamObj("", content)
    images.foreach(img =>
      objs += streamObj("/Subtype /Image /Width 100 /Height 100 /BitsPerComponent 8 /ColorSpace /DeviceRGB", img))
    assemble(objs.result(), "/Root 1 0 R")
  }

  /** PDF with per-line marked content: the heading line sits inside an /H1
    * BDC..EMC scope, body lines inside /P scopes — under extractMarkedContent
    * the XML output preserves the structural tags (reference config.go:194-198).
    */
  def markedPdf(heading: String, body: Seq[String], title: String): Array[Byte] = {
    val content = {
      val sb = new StringBuilder
      sb.append("BT /F1 12 Tf 72 720 Td\n")
      sb.append("/H1 << /MCID 0 >> BDC\n(").append(esc(heading)).append(") Tj\nEMC\n")
      body.zipWithIndex.foreach { case (l, i) =>
        sb.append("0 -14 Td\n")
        sb.append(s"/P << /MCID ${i + 1} >> BDC\n(").append(esc(l)).append(") Tj\nEMC\n")
      }
      sb.append("ET")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII"),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII"),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>".getBytes("US-ASCII"),
      streamObj("", content),
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>".getBytes("US-ASCII"),
      s"<< /Title (${esc(title)}) /Producer (extractous-spark-gen) >>".getBytes("US-ASCII"))
    assemble(objs, "/Root 1 0 R /Info 6 0 R")
  }

  /** Mixed two-page PDF: page 1 has embedded text, page 2 is image-only —
    * exercises the reference's PER-PAGE OCR-Auto predicate
    * (/root/reference/types.go:251-275): text path on page 1, OCR on page 2.
    */
  def mixedPdf(textLines: Seq[String], imageBytes: Array[Byte]): Array[Byte] = {
    val textContent = {
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      textLines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("0 -14 Td\n")
        sb.append("(").append(esc(l)).append(") Tj\n")
      }
      sb.append("ET").toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val imgContent = "q 468 0 0 648 72 72 cm /Im0 Do Q".getBytes("US-ASCII")
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII"),
      "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>".getBytes("US-ASCII"),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 7 0 R >> >> /Contents 4 0 R >>".getBytes("US-ASCII"),
      streamObj("", textContent),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /XObject << /Im0 6 0 R >> >> /Contents 8 0 R >>".getBytes("US-ASCII"),
      streamObj("/Subtype /Image /Width 100 /Height 100 /BitsPerComponent 8 /ColorSpace /DeviceRGB", imageBytes),
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>".getBytes("US-ASCII"),
      streamObj("", imgContent))
    assemble(objs, "/Root 1 0 R")
  }
}

/** Encrypted-PDF emitter: standard security handler, RC4, empty user
  * password — the "encrypted so anyone can read it" stratum a crawl
  * actually carries. DELIBERATELY independent of the parser's
  * `extractous.pdf.PdfCrypt` (own MD5/RC4/key-derivation from the published
  * spec §7.6.3), so the encrypt→decrypt round-trip is a genuine oracle: if
  * either side mis-implements an algorithm step, extraction yields RC4
  * garbage and the closed-form text oracle fails loudly.
  */
object PdfEncWriter {
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte) // spec constant, §7.6.3.3

  private def md5(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    for (k <- data.indices) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
    }
    out
  }

  private def padPwd(p: Array[Byte]): Array[Byte] =
    if (p.length >= 32) p.take(32) else p ++ Pad.take(32 - p.length)

  private def intLE(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

  private def sha2(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcRaw(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** PDF wire-format AES: PKCS#7-pad, CBC-encrypt, prepend the IV. */
  private def aesEncObj(key: Array[Byte], iv: Array[Byte], plain: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (plain.length % 16)
    val padded = plain ++ Array.fill(padLen)(padLen.toByte)
    iv ++ aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE, key, iv, padded)
  }

  /** §7.6.4.3.4 Algorithm 2.B (R6 password hash) — the writer's own copy,
    * independent of the reader's `PdfCrypt.hash2b` so the round-trip is a
    * genuine two-implementation check.
    */
  private def hash2b6(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha2("SHA-256", pwd, salt, udata)
    var e: Array[Byte] = Array.emptyByteArray
    var round = 0
    while (round < 64 || (e(e.length - 1) & 0xff) > round - 32) {
      val block = pwd ++ k ++ udata
      val k1 = Array.fill(64)(block).flatten
      e = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE, k.take(16), k.slice(16, 32), k1)
      k = (e.take(16).map(_ & 0xff).sum % 3: @unchecked) match {
        case 0 => sha2("SHA-256", e)
        case 1 => sha2("SHA-384", e)
        case 2 => sha2("SHA-512", e)
      }
      round += 1
    }
    k.take(32)
  }

  /** One-page text PDF encrypted under the standard handler.
    *
    * @param rev 2 → V1/R2 RC4-40 (content uncompressed); 3 → V2/R3 RC4-128
    *            (content Flate-compressed then encrypted — filters apply to
    *            plaintext, encryption is outermost); 4 → V4/R4 /AESV2
    *            AES-128-CBC crypt filter; 6 → V5/R6 /AESV3 AES-256 (the
    *            PDF-2.0 handler)
    * @param userPwd the user password baked into the key ("" = the openable
    *                stratum; non-empty = opens only when PdfConfig.password
    *                supplies it — as the user password or, via `ownerPwd`,
    *                the owner one — otherwise the extractor must REJECT
    *                with a status)
    * @param ownerPwd the owner password behind /O (and /OE for R6)
    */
  def encryptedTextPdf(lines: Seq[String], title: String, rev: Int, userPwd: String = "",
      xrefStream: Boolean = false, ownerPwd: String = "owner-secret"): Array[Byte] = {
    require(Set(2, 3, 4, 6).contains(rev), s"standard handler revision 2/3/4/6, got $rev")
    val keyLen = rev match { case 2 => 5; case 6 => 32; case _ => 16 }
    val perms = -4 // all permission bits granted; still a valid encrypted doc
    val id0 = md5(s"$title|${lines.length}|$rev".getBytes("UTF-8"))
    // IVs need only be unique per object; derive them from (id0, objnum) so
    // the same inputs yield byte-identical fixtures (FixedTime precedent)
    def objIv(num: Int): Array[Byte] = md5(id0 ++ intLE(num) ++ "iv".getBytes("US-ASCII")).take(16)

    // ---- legacy key schedule (R2/R3/R4 share Algorithms 2/3/4/5) ----
    lazy val (legacyKey, legacyO, legacyU) = {
      // Algorithm 3: /O from the owner password (full-digest 50x rehash for R≥3)
      val ownerDigest0 = md5(padPwd(ownerPwd.getBytes("UTF-8")))
      val ownerDigest = if (rev >= 3) (1 to 50).foldLeft(ownerDigest0)((d, _) => md5(d)) else ownerDigest0
      val ownerKey = ownerDigest.take(keyLen)
      var o = rc4(ownerKey, padPwd(userPwd.getBytes("UTF-8")))
      if (rev >= 3) for (i <- 1 to 19) o = rc4(ownerKey.map(bb => (bb ^ i).toByte), o)
      // Algorithm 2: file key (first-keyLen-bytes 50x rehash for R≥3)
      var d = md5(padPwd(userPwd.getBytes("UTF-8")) ++ o ++ intLE(perms) ++ id0)
      if (rev >= 3) for (_ <- 1 to 50) d = md5(d.take(keyLen))
      val key = d.take(keyLen)
      // Algorithms 4/5: /U
      val u =
        if (rev == 2) rc4(key, Pad)
        else {
          var x = rc4(key, md5(Pad ++ id0))
          for (i <- 1 to 19) x = rc4(key.map(bb => (bb ^ i).toByte), x)
          x ++ new Array[Byte](16)
        }
      (key, o, u)
    }
    // ---- V5/R6 key schedule (§7.6.4.4: U/UE from the user password,
    // O/OE from the owner password over U, /Perms seals P) ----
    lazy val (v5Key, v5O, v5U, v5Oe, v5Ue, v5Perms) = {
      val fileKey = sha2("SHA-256", s"fk|$title".getBytes("UTF-8"), id0)
      val pwd = userPwd.getBytes("UTF-8")
      val uvSalt = md5("uv".getBytes ++ id0).take(8)
      val ukSalt = md5("uk".getBytes ++ id0).take(8)
      val u48 = hash2b6(pwd, uvSalt, Array.emptyByteArray) ++ uvSalt ++ ukSalt
      val ue = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
        hash2b6(pwd, ukSalt, Array.emptyByteArray), new Array[Byte](16), fileKey)
      val opwd = ownerPwd.getBytes("UTF-8")
      val ovSalt = md5("ov".getBytes ++ id0).take(8)
      val okSalt = md5("ok".getBytes ++ id0).take(8)
      val o48 = hash2b6(opwd, ovSalt, u48) ++ ovSalt ++ okSalt
      val oe = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
        hash2b6(opwd, okSalt, u48), new Array[Byte](16), fileKey)
      // /Perms: AES-ECB(fileKey, P‖0xFFFFFFFF‖'T'‖"adb"‖4 arbitrary bytes)
      val permsBlock = intLE(perms) ++ Array.fill(4)(0xff.toByte) ++
        "Tadb".getBytes("US-ASCII") ++ md5(id0).take(4)
      val ecb = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      ecb.init(javax.crypto.Cipher.ENCRYPT_MODE, new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
      (fileKey, o48, u48, oe, ue, ecb.doFinal(permsBlock))
    }
    def objKey(num: Int): Array[Byte] = {
      val salt = if (rev == 4) "sAlT".getBytes("US-ASCII") else Array.emptyByteArray
      md5(legacyKey ++ Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte, 0, 0) ++ salt).take(math.min(keyLen + 5, 16))
    }
    /** The outermost per-object cipher, by revision. */
    def encObj(num: Int, plain: Array[Byte]): Array[Byte] = rev match {
      case 2 | 3 => rc4(objKey(num), plain)
      case 4     => aesEncObj(objKey(num), objIv(num), plain)
      case 6     => aesEncObj(v5Key, objIv(num), plain) // V5: file key direct
    }

    val content = {
      val sb = new StringBuilder
      sb.append("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("0 -14 Td\n")
        val esc = l.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        sb.append("(").append(esc).append(") Tj\n")
      }
      sb.append("ET")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val (filter, plainData) =
      if (rev >= 3) (" /Filter /FlateDecode", PdfWriter.deflateBytes(content)) else ("", content)
    val encData = encObj(4, plainData)
    val encTitle = encObj(6, title.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

    val objs = Seq.newBuilder[Array[Byte]]
    objs += "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII")
    objs += "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII")
    objs += "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>".getBytes("US-ASCII")
    objs += {
      val out = new ByteArrayOutputStream()
      out.write(s"<<$filter /Length ${encData.length} >>\nstream\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(encData)
      out.write("\nendstream".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.toByteArray
    }
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>".getBytes("US-ASCII")
    objs += s"<< /Title <${hex(encTitle)}> /Producer <${hex(encObj(6, "extractous-spark-gen".getBytes("US-ASCII")))}> >>".getBytes("US-ASCII")
    objs += {
      rev match {
        case 2 =>
          s"<< /Filter /Standard /V 1 /R 2 /O <${hex(legacyO)}> /U <${hex(legacyU)}> /P $perms >>".getBytes("US-ASCII")
        case 3 =>
          s"<< /Filter /Standard /V 2 /Length 128 /R 3 /O <${hex(legacyO)}> /U <${hex(legacyU)}> /P $perms >>".getBytes("US-ASCII")
        case 4 =>
          ("<< /Filter /Standard /V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
            s"/StmF /StdCF /StrF /StdCF /O <${hex(legacyO)}> /U <${hex(legacyU)}> /P $perms >>").getBytes("US-ASCII")
        case 6 =>
          ("<< /Filter /Standard /V 5 /R 6 /Length 256 /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
            s"/StmF /StdCF /StrF /StdCF /O <${hex(v5O)}> /U <${hex(v5U)}> /OE <${hex(v5Oe)}> /UE <${hex(v5Ue)}> " +
            s"/Perms <${hex(v5Perms)}> /P $perms >>").getBytes("US-ASCII")
      }
    }
    val trailerEntries = s"/Root 1 0 R /Info 6 0 R /Encrypt 7 0 R /ID [<${hex(id0)}> <${hex(id0)}>]"
    if (xrefStream) PdfWriter.assembleObjectsXrefStream(objs.result(), trailerEntries)
    else PdfWriter.assembleObjects(objs.result(), trailerEntries)
  }

  /** An /Encrypt dict naming a crypt-filter method the extractor does not
    * speak (a made-up /CFM /AESV9) — must be honestly refused with status
    * -8 unsupported format, never garbage. (AESV2/AESV3 themselves are
    * SUPPORTED since round 4 — see `encryptedTextPdf` rev 4/6.)
    */
  def unknownCfmEncryptedPdf(): Array[Byte] = {
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII"),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII"),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>".getBytes("US-ASCII"),
      "<< /Length 4 >>\nstream\nq Q\nendstream".getBytes("US-ASCII"),
      ("<< /Filter /Standard /V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV9 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O <${"00" * 32}> /U <${"00" * 32}> /P -4 >>").getBytes("US-ASCII"))
    PdfWriter.assembleObjects(objs, s"/Root 1 0 R /Encrypt 5 0 R /ID [<${"11" * 16}> <${"11" * 16}>]")
  }
}

object DocxWriter {
  /** Fixed entry mtime so the same inputs yield byte-identical zips. */
  private val FixedTime = 1704067200000L // 2024-01-01T00:00:00Z

  def xmlEsc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = zip(entries, Set.empty)

  /** `storedNames` entries are written STORED (uncompressed) — ODF requires
    * its `mimetype` entry stored first so magic-byte sniffers can read the
    * document type without inflating anything.
    */
  def zip(entries: Seq[(String, Array[Byte])], storedNames: Set[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.setLevel(Deflater.BEST_SPEED)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      if (storedNames.contains(name)) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(data.length.toLong)
        e.setCompressedSize(data.length.toLong)
        val crc = new CRC32()
        crc.update(data)
        e.setCrc(crc.getValue)
      }
      zos.putNextEntry(e)
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** DOCX with: heading + body paragraphs, a tracked-change deletion, a
    * move-from run, and a text-box paragraph — one probe per Office config
    * toggle (/root/reference/config.go:244-415).
    */
  /** A fake-but-binary vbaProject.bin: OLE2 signature + non-printable padding
    * around one printable macro source line — what a forensic strings-scan of
    * a real macro stream yields.
    */
  def vbaProjectBin(macroSource: String): Array[Byte] = {
    val sig = Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11, 0xe0.toByte, 0xa1.toByte, 0xb1.toByte, 0x1a, 0xe1.toByte)
    val pad = Array.tabulate[Byte](24)(i => ((i * 7 + 1) % 31).toByte) // all < 0x20: non-printable
    sig ++ pad ++ macroSource.getBytes("US-ASCII") ++ pad
  }

  def docx(paragraphs: Seq[String], title: String, deleted: String, moved: String, shape: String,
      macros: Option[String] = None): Array[Byte] = {
    val body = new StringBuilder
    paragraphs.foreach(p => body.append(s"<w:p><w:r><w:t>${xmlEsc(p)}</w:t></w:r></w:p>"))
    body.append(s"<w:p><w:del><w:r><w:delText>${xmlEsc(deleted)}</w:delText></w:r></w:del></w:p>")
    body.append(s"<w:p><w:moveFrom><w:r><w:t>${xmlEsc(moved)}</w:t></w:r></w:moveFrom></w:p>")
    body.append(s"<w:p><w:r><w:pict><w:txbxContent><w:p><w:r><w:t>${xmlEsc(shape)}</w:t></w:r></w:p></w:txbxContent></w:pict></w:r></w:p>")
    val document =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>${body.toString}</w:body></w:document>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
    val core =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:title>${xmlEsc(title)}</dc:title><dc:creator>extractous-spark-gen</dc:creator></cp:coreProperties>"""
    zip(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes("UTF-8"),
      "word/document.xml" -> document.getBytes("UTF-8"),
      "docProps/core.xml" -> core.getBytes("UTF-8")) ++
      macros.map(src => "word/vbaProject.bin" -> vbaProjectBin(src)).toSeq)
  }
}

/** Legacy Word-97 binary (.doc) writer: a real MS-CFB container (512-byte
  * sectors, FAT + directory; mini-stream/miniFAT when the WordDocument stream
  * is under the 4096-byte cutoff, exactly like real writers) holding a
  * non-complex FIB whose fcMin..fcMac text area carries the paragraphs,
  * cp1252-encoded, '\r' paragraph marks.
  */
object DocWriter {
  private val SectorSize = 512
  private val Free = 0xffffffff
  private val Eoc = 0xfffffffe
  private val FatSect = 0xfffffffd

  def doc(paragraphs: Seq[String]): Array[Byte] = {
    val text = paragraphs.mkString("\r").getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val stream = new Array[Byte](512 + text.length)
    val sb = java.nio.ByteBuffer.wrap(stream).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.putShort(0, 0xa5ec.toShort) // wIdent
    sb.putShort(2, 0x00c1.toShort) // nFib (Word 97)
    sb.putShort(0x0a, 0)           // flags: fComplex = 0
    sb.putInt(0x18, 512)           // fcMin
    sb.putInt(0x1c, 512 + text.length) // fcMac
    System.arraycopy(text, 0, stream, 512, text.length)
    wrap("WordDocument", stream)
  }

  /** Wrap one application stream in a CFB container under `streamName` — the
    * shared shell for .doc/.xls/.ppt fixtures (real MS-CFB: FAT + directory,
    * mini-stream/miniFAT below the 4096-byte cutoff like real writers).
    */
  def wrap(streamName: String, stream: Array[Byte]): Array[Byte] = {
    val useMini = stream.length < 4096
    val dataSectors = if (useMini) (stream.length + 63) / 64 * 64 else stream.length
    val dataSectorCount = (dataSectors + SectorSize - 1) / SectorSize

    // sector plan: 0=FAT, 1=directory, [2=miniFAT], then data sectors
    val firstData = if (useMini) 3 else 2
    val totalSectors = firstData + dataSectorCount
    require(totalSectors <= SectorSize / 4, "doc writer: single FAT sector exceeded")

    val out = new Array[Byte]((totalSectors + 1) * SectorSize)
    val ob = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    // ---- header ----
    ob.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    ob.putShort(0x18, 0x003e) // minor version
    ob.putShort(0x1a, 0x0003) // major version 3
    ob.putShort(0x1c, 0xfffe.toShort) // byte order
    ob.putShort(0x1e, 9)      // sector shift
    ob.putShort(0x20, 6)      // mini sector shift
    ob.putInt(0x2c, 1)        // # FAT sectors
    ob.putInt(0x30, 1)        // first directory sector
    ob.putInt(0x38, 4096)     // mini stream cutoff
    ob.putInt(0x3c, if (useMini) 2 else Eoc) // first miniFAT sector
    ob.putInt(0x40, if (useMini) 1 else 0)   // # miniFAT sectors
    ob.putInt(0x44, Eoc)      // first DIFAT sector
    ob.putInt(0x48, 0)        // # DIFAT sectors
    ob.putInt(0x4c, 0)        // DIFAT[0] → FAT sector 0
    (1 until 109).foreach(i => ob.putInt(0x4c + i * 4, Free))

    def sectorOff(s: Int) = (s + 1) * SectorSize

    // ---- FAT (sector 0) ----
    val fatOff = sectorOff(0)
    (0 until SectorSize / 4).foreach(i => ob.putInt(fatOff + i * 4, Free))
    ob.putInt(fatOff + 0 * 4, FatSect)
    ob.putInt(fatOff + 1 * 4, Eoc) // directory: single sector
    if (useMini) ob.putInt(fatOff + 2 * 4, Eoc) // miniFAT: single sector
    (0 until dataSectorCount).foreach { i =>
      val s = firstData + i
      ob.putInt(fatOff + s * 4, if (i == dataSectorCount - 1) Eoc else s + 1)
    }

    // ---- directory (sector 1) ----
    def dirEntry(idx: Int, name: String, objType: Int, start: Int, size: Long, child: Int): Unit = {
      val base = sectorOff(1) + idx * 128
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(nameBytes, 0, out, base, nameBytes.length)
      ob.putShort(base + 64, ((name.length + 1) * 2).toShort)
      out(base + 66) = objType.toByte
      out(base + 67) = 1 // black
      ob.putInt(base + 68, Free)  // left sibling
      ob.putInt(base + 72, Free)  // right sibling
      ob.putInt(base + 76, child) // child
      ob.putInt(base + 116, start)
      ob.putLong(base + 120, size)
    }
    if (useMini) {
      dirEntry(0, "Root Entry", 5, firstData, dataSectors.toLong, child = 1)
      dirEntry(1, streamName, 2, 0, stream.length.toLong, child = Free)
    } else {
      dirEntry(0, "Root Entry", 5, Eoc, 0L, child = 1)
      dirEntry(1, streamName, 2, firstData, stream.length.toLong, child = Free)
    }
    // remaining two directory slots stay zeroed (objType 0 = unused)

    // ---- miniFAT (sector 2) + data ----
    if (useMini) {
      val mfOff = sectorOff(2)
      (0 until SectorSize / 4).foreach(i => ob.putInt(mfOff + i * 4, Free))
      val miniCount = (stream.length + 63) / 64
      (0 until miniCount).foreach(i => ob.putInt(mfOff + i * 4, if (i == miniCount - 1) Eoc else i + 1))
    }
    System.arraycopy(stream, 0, out, sectorOff(firstData), stream.length)
    out
  }
}

/** General multi-stream CFB writer — the shell for .msg fixtures (several
  * root-level property streams in one container). Real MS-CFB: single FAT
  * sector, multi-sector directory chain, miniFAT + root mini-stream for
  * streams under the 4096 cutoff, regular FAT chains above it. Streams are
  * linked root→child→right-sibling (a legal, if degenerate, red-black tree).
  */
object CfbWriter {
  private val SectorSize = 512
  private val Free = 0xffffffff
  private val Eoc = 0xfffffffe
  private val FatSect = 0xfffffffd

  def multi(streams: Seq[(String, Array[Byte])]): Array[Byte] = build(streams, nSub = 0, storageName = "")

  /** Like [[multi]], but the FIRST `nSub` streams live inside a substorage
    * named `storageName` (the Outlook attachment layout: an
    * `__attach_version1.0_#00000000` storage carrying its own
    * `__substg1.0_*` property streams). The substorage's streams come FIRST
    * in flat directory order — the exact shadowing trap MS-OXMSG readers
    * must survive by walking the root's red-black tree instead of scanning
    * the directory flat.
    */
  def withStorage(storageName: String, subStreams: Seq[(String, Array[Byte])],
      rootStreams: Seq[(String, Array[Byte])]): Array[Byte] =
    build(subStreams ++ rootStreams, nSub = subStreams.length, storageName = storageName)

  private def build(streams: Seq[(String, Array[Byte])], nSub: Int, storageName: String): Array[Byte] = {
    val hasStorage = nSub > 0
    val nDir = 1 + (if (hasStorage) 1 else 0) + streams.length
    val dirSectors = (nDir * 128 + SectorSize - 1) / SectorSize
    val isMini: ((String, Array[Byte])) => Boolean = _._2.length < 4096
    val miniSectorsOf = (b: Array[Byte]) => (b.length + 63) / 64
    val miniTotal = streams.filter(isMini).map(s => miniSectorsOf(s._2) * 64).sum
    val useMini = miniTotal > 0
    val miniContainerSectors = (miniTotal + SectorSize - 1) / SectorSize

    val firstDir = 1
    val miniFatSector = firstDir + dirSectors // only meaningful if useMini
    val firstMiniData = miniFatSector + 1
    val firstBig = if (useMini) firstMiniData + miniContainerSectors else firstDir + dirSectors
    val bigSizes = streams.map(s => if (isMini(s)) 0 else (s._2.length + SectorSize - 1) / SectorSize)
    val totalSectors = firstBig + bigSizes.sum
    require(totalSectors <= SectorSize / 4, "cfb writer: single FAT sector exceeded")
    require(miniTotal / 64 <= SectorSize / 4, "cfb writer: single miniFAT sector exceeded")

    val out = new Array[Byte]((totalSectors + 1) * SectorSize)
    val ob = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    // ---- header ----
    ob.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    ob.putShort(0x18, 0x003e)
    ob.putShort(0x1a, 0x0003)
    ob.putShort(0x1c, 0xfffe.toShort)
    ob.putShort(0x1e, 9)
    ob.putShort(0x20, 6)
    ob.putInt(0x2c, 1)
    ob.putInt(0x30, firstDir)
    ob.putInt(0x38, 4096)
    ob.putInt(0x3c, if (useMini) miniFatSector else Eoc)
    ob.putInt(0x40, if (useMini) 1 else 0)
    ob.putInt(0x44, Eoc)
    ob.putInt(0x48, 0)
    ob.putInt(0x4c, 0)
    (1 until 109).foreach(i => ob.putInt(0x4c + i * 4, Free))

    def sectorOff(s: Int) = (s + 1) * SectorSize

    // ---- FAT (sector 0) ----
    val fatOff = sectorOff(0)
    (0 until SectorSize / 4).foreach(i => ob.putInt(fatOff + i * 4, Free))
    ob.putInt(fatOff, FatSect)
    (0 until dirSectors).foreach { i =>
      ob.putInt(fatOff + (firstDir + i) * 4, if (i == dirSectors - 1) Eoc else firstDir + i + 1)
    }
    if (useMini) {
      ob.putInt(fatOff + miniFatSector * 4, Eoc)
      (0 until miniContainerSectors).foreach { i =>
        ob.putInt(fatOff + (firstMiniData + i) * 4,
          if (i == miniContainerSectors - 1) Eoc else firstMiniData + i + 1)
      }
    }
    var bigCursor = firstBig
    streams.zip(bigSizes).foreach { case (_, n) =>
      (0 until n).foreach { i =>
        ob.putInt(fatOff + (bigCursor + i) * 4, if (i == n - 1) Eoc else bigCursor + i + 1)
      }
      bigCursor += n
    }

    // ---- directory ----
    def dirEntry(idx: Int, name: String, objType: Int, start: Int, size: Long,
        child: Int, right: Int): Unit = {
      val base = sectorOff(firstDir) + idx * 128
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      require(nameBytes.length <= 62, s"cfb writer: name too long: $name")
      System.arraycopy(nameBytes, 0, out, base, nameBytes.length)
      ob.putShort(base + 64, ((name.length + 1) * 2).toShort)
      out(base + 66) = objType.toByte
      out(base + 67) = 1 // black
      ob.putInt(base + 68, Free)  // left sibling
      ob.putInt(base + 72, right) // right sibling
      ob.putInt(base + 76, child)
      ob.putInt(base + 116, start)
      ob.putLong(base + 120, size)
    }
    val slotShift = if (hasStorage) 2 else 1 // stream k's directory slot = k + slotShift
    dirEntry(0, "Root Entry", 5,
      if (useMini) firstMiniData else Eoc, miniTotal.toLong,
      child = if (hasStorage) 1 else if (streams.nonEmpty) 1 else Free, right = Free)
    if (hasStorage)
      // the storage's OWN children are the substreams (slots 2..1+nSub);
      // its right sibling starts the root-level stream chain
      dirEntry(1, storageName, 1, 0, 0L,
        child = slotShift,
        right = if (streams.length > nSub) slotShift + nSub else Free)

    // ---- stream data + per-stream start sectors ----
    var miniIdx = 0   // running mini-sector index inside the mini stream
    var bigSector = firstBig
    val mfOff = sectorOff(miniFatSector)
    if (useMini) (0 until SectorSize / 4).foreach(i => ob.putInt(mfOff + i * 4, Free))
    streams.zipWithIndex.foreach { case ((name, data), k) =>
      // sibling chains end at the substorage boundary and at the last stream
      val right =
        if (hasStorage && k == nSub - 1) Free
        else if (k == streams.length - 1) Free
        else k + slotShift + 1
      if (isMini((name, data))) {
        val n = miniSectorsOf(data)
        (0 until n).foreach { i =>
          ob.putInt(mfOff + (miniIdx + i) * 4, if (i == n - 1) Eoc else miniIdx + i + 1)
        }
        System.arraycopy(data, 0, out, sectorOff(firstMiniData) + miniIdx * 64, data.length)
        dirEntry(k + slotShift, name, 2, miniIdx, data.length.toLong, child = Free, right = right)
        miniIdx += n
      } else {
        System.arraycopy(data, 0, out, sectorOff(bigSector), data.length)
        dirEntry(k + slotShift, name, 2, bigSector, data.length.toLong, child = Free, right = right)
        bigSector += (data.length + SectorSize - 1) / SectorSize
      }
    }
    out
  }
}

/** iWork Pages '09 package writer: zip with the content in `index.xml`
  * (namespaced `sl:document` → `sf:text-storage` → `sf:text-body` → `sf:p`
  * paragraphs) plus the `QuickLook/Thumbnail.jpg` member every real '09
  * package carries (the sniffer keys on index.xml + QuickLook/ together).
  */
object PagesWriter {
  def pages(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p => s"<sf:p>${DocxWriter.xmlEsc(p)}</sf:p>").mkString("\n")
    val index =
      s"""<?xml version="1.0" encoding="UTF-8"?>
<sl:document xmlns:sl="http://developer.apple.com/namespaces/sl" xmlns:sf="http://developer.apple.com/namespaces/sf">
<sf:text-storage sf:kind="body">
<sf:text-body>
$body
</sf:text-body>
</sf:text-storage>
</sl:document>
"""
    DocxWriter.zip(Seq(
      "index.xml" -> index.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      "QuickLook/Thumbnail.jpg" -> Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
  }
}

/** ustar (POSIX.1-1988) TAR writer: 512-byte headers with octal size/mtime,
  * correct checksum (field-as-spaces sum), data padded to 512, two zero
  * blocks at the end — the shape every `tar cf` produces for regular files.
  */
/** .7z writer (7zFormat.txt): one folder per member (Copy, LZMA or LZMA2
  * via the independent [[LzmaWriter]] encoder), optional LZMA-compressed
  * kEncodedHeader metadata (what `7z a` emits by default), no CRC digests,
  * no empty streams — minimal but spec-conformant, and independent of the
  * reader in extractous.core.SevenZip.
  */
object SevenZWriter {
  private def crc32(b: Array[Byte]): Long = {
    val c = new CRC32(); c.update(b); c.getValue
  }

  /** 7z variable-length number: minimal single byte for < 0x80, else the
    * legal full 8-extra-byte form (first byte 0xFF).
    */
  private def num(out: ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0 && v < 0x80) out.write(v.toInt)
    else {
      out.write(0xff)
      var i = 0
      var x = v
      while (i < 8) { out.write((x & 0xff).toInt); x >>>= 8; i += 1 }
    }

  /** Signature + start header (with both CRCs) + pack area + end header. */
  private def container(packed: Array[Byte], endHeader: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte]('7', 'z', 0xBC.toByte, 0xAF.toByte, 0x27, 0x1C, 0, 4))
    val sh = new ByteArrayOutputStream() // the 20 CRC-protected bytes
    var x = packed.length.toLong
    (0 until 8).foreach { _ => sh.write((x & 0xff).toInt); x >>>= 8 }
    x = endHeader.length.toLong
    (0 until 8).foreach { _ => sh.write((x & 0xff).toInt); x >>>= 8 }
    x = crc32(endHeader)
    (0 until 4).foreach { _ => sh.write((x & 0xff).toInt); x >>>= 8 }
    val shBytes = sh.toByteArray
    x = crc32(shBytes)
    (0 until 4).foreach { _ => out.write((x & 0xff).toInt); x >>>= 8 }
    out.write(shBytes)
    out.write(packed)
    out.write(endHeader)
    out.toByteArray
  }

  /** (packed bytes, coder chain as (id, props) pairs in decode order —
    * coder 0 consumes the pack stream, each next coder consumes the
    * previous one's output via a bind pair) for one member.
    */
  private def encodeMember(d: Array[Byte], coder: String): (Array[Byte], Seq[(Array[Byte], Array[Byte])]) =
    coder match {
      case "copy" => (d, Seq((Array[Byte](0x00), Array.emptyByteArray)))
      case "lzma" =>
        val (props, enc) = LzmaWriter.encode(d)
        (enc, Seq((Array[Byte](0x03, 0x01, 0x01), props)))
      case "lzma2" =>
        // props: one dictionary-size byte; 24 → (2|0) << 23 = 16 MiB
        (LzmaWriter.encodeLzma2(d), Seq((Array[Byte](0x21), Array[Byte](24))))
      case "bcj-lzma" =>
        // the `-mf=BCJ` layout: data --x86-encode--> LZMA; decode chain is
        // LZMA (coder 0, consumes pack) then BCJ x86 (coder 1, via bind pair)
        val filtered = d.clone()
        extractous.core.Bra.x86(filtered, encoding = true)
        val (props, enc) = LzmaWriter.encode(filtered)
        (enc, Seq((Array[Byte](0x03, 0x01, 0x01), props),
          (Array[Byte](0x03, 0x03, 0x01, 0x03), Array.emptyByteArray)))
      case "delta-lzma2" =>
        val filtered = d.clone()
        extractous.core.Bra.deltaEncode(filtered, 4)
        (LzmaWriter.encodeLzma2(filtered), Seq((Array[Byte](0x21), Array[Byte](24)),
          (Array[Byte](0x03), Array[Byte](3)))) // delta props: dist - 1
      case other => throw new IllegalArgumentException(s"unknown 7z coder $other")
    }

  /** One folder per member with the chosen coder for every member; when
    * `encodedHeader` is set the metadata block is LZMA-compressed and the
    * root property becomes kEncodedHeader (0x17) — the layout `7z a`
    * produces by default.
    */
  def sevenZ(members: Seq[(String, Array[Byte])], coder: String = "copy",
             encodedHeader: Boolean = false): Array[Byte] = {
    val n = members.length
    val enc = members.map { case (_, d) => encodeMember(d, coder) }
    val packed = new ByteArrayOutputStream()
    enc.foreach { case (p, _) => packed.write(p) }

    val h = new ByteArrayOutputStream()
    h.write(0x01) // kHeader
    h.write(0x04) // kMainStreamsInfo
    h.write(0x06) // kPackInfo
    num(h, 0)     // PackPos
    num(h, n)     // NumPackStreams
    h.write(0x09) // kSize
    enc.foreach { case (p, _) => num(h, p.length) }
    h.write(0x00) // end PackInfo
    h.write(0x07) // kUnPackInfo
    h.write(0x0B) // kFolder
    num(h, n)
    h.write(0x00) // not external
    enc.foreach { case (_, chain) =>
      num(h, chain.length) // coders in the chain
      chain.foreach { case (id, props) =>
        h.write(id.length | (if (props.nonEmpty) 0x20 else 0x00)) // flag: id size, simple
        h.write(id)
        if (props.nonEmpty) { num(h, props.length); h.write(props) }
      }
      // bind pairs: coder k+1's input <- coder k's output (simple coders,
      // so global in/out stream index == coder index)
      (0 until chain.length - 1).foreach { k => num(h, k + 1); num(h, k) }
    }
    h.write(0x0C) // kCodersUnpackSize: one size per coder output — every
    // coder in these chains is length-preserving past the decompressor, so
    // all outputs equal the member length
    members.zip(enc).foreach { case ((_, d), (_, chain)) =>
      chain.foreach(_ => num(h, d.length))
    }
    h.write(0x00) // end UnPackInfo
    h.write(0x00) // end MainStreamsInfo
    h.write(0x05) // kFilesInfo
    num(h, n)
    val nameBytes = new ByteArrayOutputStream()
    nameBytes.write(0) // not external
    members.foreach { case (name, _) =>
      nameBytes.write(name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
      nameBytes.write(0); nameBytes.write(0)
    }
    h.write(0x11) // kName
    num(h, nameBytes.size())
    nameBytes.writeTo(h)
    h.write(0x00) // end FilesInfo
    h.write(0x00) // end kHeader
    val header = h.toByteArray

    if (!encodedHeader) container(packed.toByteArray, header)
    else {
      // compress the metadata block itself; the end header becomes a
      // kEncodedHeader StreamsInfo pointing at one LZMA folder appended
      // after the member pack streams
      val (hProps, hPacked) = LzmaWriter.encode(header)
      val raw = new ByteArrayOutputStream()
      raw.write(0x17)                   // kEncodedHeader
      raw.write(0x06)                   // kPackInfo
      num(raw, packed.size())           // PackPos: after the member streams
      num(raw, 1)
      raw.write(0x09); num(raw, hPacked.length)
      raw.write(0x00)
      raw.write(0x07); raw.write(0x0B)  // kUnPackInfo, kFolder
      num(raw, 1); raw.write(0x00)
      num(raw, 1)                       // one coder
      raw.write(0x23)                   // id size 3, has attributes
      raw.write(0x03); raw.write(0x01); raw.write(0x01) // LZMA
      num(raw, hProps.length); raw.write(hProps)
      raw.write(0x0C); num(raw, header.length)
      raw.write(0x00)                   // end UnPackInfo
      raw.write(0x00)                   // end StreamsInfo
      packed.write(hPacked)
      container(packed.toByteArray, raw.toByteArray)
    }
  }

  /** A .7z whose single folder declares a coder outside the decoded set
    * (BZip2, 0x040202) — the honest-rejection fixture (status −8; we
    * refuse to guess compressed bytes, never emit garbage).
    */
  def unsupportedCoder7z(payloadLen: Int): Array[Byte] = {
    val fake = new Array[Byte](payloadLen) // opaque "compressed" bytes
    val h = new ByteArrayOutputStream()
    h.write(0x01); h.write(0x04)
    h.write(0x06); num(h, 0); num(h, 1); h.write(0x09); num(h, payloadLen); h.write(0x00)
    h.write(0x07); h.write(0x0B); num(h, 1); h.write(0x00)
    num(h, 1)        // one coder
    h.write(0x03)    // flag: id size 3, simple, no attrs
    h.write(0x04); h.write(0x02); h.write(0x02) // BZip2
    h.write(0x0C); num(h, payloadLen * 4); h.write(0x00)
    h.write(0x00)
    h.write(0x05); num(h, 1)
    val nb = new ByteArrayOutputStream()
    nb.write(0)
    nb.write("a.txt".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)); nb.write(0); nb.write(0)
    h.write(0x11); num(h, nb.size()); nb.writeTo(h)
    h.write(0x00); h.write(0x00)
    container(fake, h.toByteArray)
  }
}

/** .xz writer (XZ file-format spec v1.0.4): one LZMA2 block via the
  * independent [[LzmaWriter]], sizes carried in the index like the `xz`
  * CLI's default layout (no block-header size fields), selectable check
  * type — independent of the reader in extractous.core.Xz, so round-trips
  * are a genuine two-implementation oracle.
  */
object XzWriter {
  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32(); c.update(b, off, len); c.getValue
  }

  /** XZ multibyte integer: 7 bits per byte LE, high bit = continuation. */
  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def le32(out: ByteArrayOutputStream, v: Long): Unit =
    (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))

  /** checkType: 0 = None, 1 = CRC32 (default), 4 = CRC64, 10 = SHA-256. */
  def xz(data: Array[Byte], checkType: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xFD.toByte, '7'.toByte, 'z'.toByte, 'X'.toByte, 'Z'.toByte, 0x00.toByte))
    val flags = Array[Byte](0x00, checkType.toByte)
    out.write(flags)
    le32(out, crc32(flags, 0, 2))

    // block header: no size fields, single LZMA2 filter, zero-padded to 4n
    val bh = new ByteArrayOutputStream()
    bh.write(0x00)            // placeholder for the size byte
    bh.write(0x00)            // flags: 1 filter, no size fields
    varint(bh, 0x21)          // LZMA2
    varint(bh, 1)             // one property byte
    bh.write(24)              // dictionary size: (2|0) << 23 = 16 MiB
    while ((bh.size() + 4) % 4 != 0) bh.write(0x00)
    val bhBytes = bh.toByteArray
    bhBytes(0) = ((bhBytes.length + 4) / 4 - 1).toByte
    out.write(bhBytes)
    le32(out, crc32(bhBytes, 0, bhBytes.length))
    val headerLen = bhBytes.length + 4

    val packed = LzmaWriter.encodeLzma2(data)
    out.write(packed)
    var pad = 0
    while ((packed.length + pad) % 4 != 0) { out.write(0x00); pad += 1 }
    val check: Array[Byte] = checkType match {
      case 0 => Array.emptyByteArray
      case 1 =>
        val b = new ByteArrayOutputStream(); le32(b, crc32(data, 0, data.length)); b.toByteArray
      case 4 =>
        val c = extractous.core.Xz.crc64(data)
        Array.tabulate[Byte](8)(i => ((c >>> (8 * i)) & 0xff).toByte)
      case 10 => java.security.MessageDigest.getInstance("SHA-256").digest(data)
      case other => throw new IllegalArgumentException(s"xz writer: check type $other")
    }
    out.write(check)
    val unpaddedSize = headerLen + packed.length + check.length

    // index: one record, zero-padded to 4n, CRC32 over indicator..padding
    val idx = new ByteArrayOutputStream()
    idx.write(0x00)
    varint(idx, 1)
    varint(idx, unpaddedSize)
    varint(idx, data.length)
    while (idx.size() % 4 != 0) idx.write(0x00)
    val idxBytes = idx.toByteArray
    out.write(idxBytes)
    le32(out, crc32(idxBytes, 0, idxBytes.length))

    // footer: crc32(backward+flags), backward size, flags, "YZ"
    val tail = new ByteArrayOutputStream()
    le32(tail, (idxBytes.length + 4) / 4 - 1)
    tail.write(flags)
    val tailBytes = tail.toByteArray
    le32(out, crc32(tailBytes, 0, tailBytes.length))
    out.write(tailBytes)
    out.write('Y'); out.write('Z')
    out.toByteArray
  }
}

object TarWriter {
  def tar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      def put(s: String, off: Int): Unit = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        System.arraycopy(b, 0, h, off, b.length)
      }
      require(name.getBytes(java.nio.charset.StandardCharsets.US_ASCII).length < 100, "tar name too long")
      put(name, 0)
      put("0000644", 100)              // mode
      put("0000000", 108)              // uid
      put("0000000", 116)              // gid
      put(f"${data.length}%011o", 124) // size (11 octal digits + NUL)
      put("00000000000", 136)          // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces while summing
      h(156) = '0'                     // typeflag: regular file
      put("ustar", 257); h(262) = 0    // magic
      put("00", 263)                   // version
      var sum = 0L
      (0 until 512).foreach(i => sum += h(i) & 0xff)
      put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    out.write(new Array[Byte](1024)) // end-of-archive marker
    out.toByteArray
  }
}

/** Outlook MSG (MS-OXMSG) fixture writer: root-level `__substg1.0_PPPPTTTT`
  * property streams — subject 0x0037, sender name 0x0C1A, plain-text body
  * 0x1000 — typed 001F (UTF-16LE) or 001E (windows-1252). The two on-disk
  * variants every real Outlook save produces for text properties.
  */
object MsgWriter {
  def msg(subject: String, sender: String, body: String, unicode: Boolean): Array[Byte] = {
    def enc(s: String): Array[Byte] =
      if (unicode) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else s.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val t = if (unicode) "001F" else "001E"
    CfbWriter.multi(Seq(
      s"__substg1.0_0037$t" -> enc(subject),
      s"__substg1.0_0C1A$t" -> enc(sender),
      s"__substg1.0_1000$t" -> enc(body)))
  }
}

/** EPUB writer: zip with STORED `mimetype` first (like ODF), container.xml →
  * OPF → two XHTML chapters. The chapters are stored in REVERSE order in the
  * zip while the spine orders them forward — an extractor that walks entries
  * instead of the spine emits them backwards and fails the oracle.
  */
object EpubWriter {
  import DocxWriter.{xmlEsc, zip}

  def epub(heading: String, paragraphs: Seq[String], secondChapter: String, title: String): Array[Byte] = {
    val ch1 =
      s"""<?xml version="1.0" encoding="UTF-8"?><html xmlns="http://www.w3.org/1999/xhtml"><body><h1>${xmlEsc(heading)}</h1>${paragraphs.map(p => s"<p>${xmlEsc(p)}</p>").mkString}</body></html>"""
    val ch2 =
      s"""<?xml version="1.0" encoding="UTF-8"?><html xmlns="http://www.w3.org/1999/xhtml"><body><p>${xmlEsc(secondChapter)}</p></body></html>"""
    val container =
      """<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>"""
    val opf =
      s"""<?xml version="1.0"?><package version="3.0" xmlns="http://www.idpf.org/2007/opf"><metadata xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:title>${xmlEsc(title)}</dc:title></metadata><manifest><item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/><item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/></manifest><spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>"""
    zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes("US-ASCII"),
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "OEBPS/ch2.xhtml" -> ch2.getBytes("UTF-8"), // reversed on purpose
      "OEBPS/ch1.xhtml" -> ch1.getBytes("UTF-8"),
      "OEBPS/content.opf" -> opf.getBytes("UTF-8")),
      storedNames = Set("mimetype"))
  }
}

/** Legacy Excel-97 binary (.xls) writer: a CFB container holding a `Workbook`
  * stream in BIFF8 — globals BOF, SST with the shared strings, sheet BOF,
  * one LABELSST cell per string, EOFs. The subset every plain Excel-97 save
  * produces for text content.
  */
object XlsWriter {
  def xls(strings: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def rec(typ: Int, payload: Array[Byte]): Unit = {
      out.write(typ & 0xff); out.write((typ >> 8) & 0xff)
      out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
      out.write(payload)
    }
    def bof(dt: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0600.toShort).putShort(dt.toShort) // BIFF8, substream type
      b.array()
    }
    rec(0x0809, bof(0x0005)) // workbook globals
    // SST: total refs (== unique here), unique count, XLUnicodeStrings
    val sst = new java.io.ByteArrayOutputStream()
    val sb4 = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb4.putInt(strings.length).putInt(strings.length)
    sst.write(sb4.array())
    strings.foreach { s =>
      val ascii = s.forall(_ < 0x100)
      val chars = if (ascii) s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
                  else s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      sst.write(s.length & 0xff); sst.write((s.length >> 8) & 0xff) // cch
      sst.write(if (ascii) 0x00 else 0x01)                          // fHighByte
      sst.write(chars)
    }
    rec(0x00fc, sst.toByteArray)
    rec(0x000a, Array.emptyByteArray) // EOF globals
    rec(0x0809, bof(0x0010)) // worksheet
    strings.indices.foreach { i =>
      val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(i.toShort).putShort(0).putShort(0x000f).putInt(i) // row, col, ixfe, isst
      rec(0x00fd, b.array())
    }
    rec(0x000a, Array.emptyByteArray) // EOF sheet
    DocWriter.wrap("Workbook", out.toByteArray)
  }
}

/** Legacy PowerPoint-97 binary (.ppt) writer: a CFB container holding a
  * `PowerPoint Document` stream of PPT records — a SlideListWithText
  * container wrapping TextHeaderAtom + TextCharsAtom/TextBytesAtom pairs,
  * the record shapes POI's text extraction walks.
  */
object PptWriter {
  private def recHeader(verInstance: Int, typ: Int, len: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(verInstance.toShort).putShort(typ.toShort).putInt(len)
    b.array()
  }

  def ppt(lines: Seq[String]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    lines.foreach { line =>
      body.write(recHeader(0x0000, 0x0f9f, 4)) // TextHeaderAtom: txType
      body.write(java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(0).array())
      val ascii = line.forall(_ < 0x100)
      if (ascii) {
        val bytes = line.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        body.write(recHeader(0x0000, 0x0fa8, bytes.length)) // TextBytesAtom
        body.write(bytes)
      } else {
        val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        body.write(recHeader(0x0000, 0x0fa0, bytes.length)) // TextCharsAtom
        body.write(bytes)
      }
    }
    val stream = new java.io.ByteArrayOutputStream()
    stream.write(recHeader(0x000f, 0x0ff0, body.size)) // SlideListWithText container
    body.writeTo(stream)
    DocWriter.wrap("PowerPoint Document", stream.toByteArray)
  }
}

/** OpenDocument (ODT/ODS/ODP) writers: ODF zip layout — STORED `mimetype`
  * entry first (per spec, so sniffers read it raw), `content.xml` body,
  * `meta.xml` Dublin Core title. The reference covers these through Tika
  * (/root/reference/config.go:241, README.md:271).
  */
object OdfWriter {
  import DocxWriter.{xmlEsc, zip}

  val OdtMime = "application/vnd.oasis.opendocument.text"
  val OdsMime = "application/vnd.oasis.opendocument.spreadsheet"
  val OdpMime = "application/vnd.oasis.opendocument.presentation"

  private def pack(mime: String, contentXml: String, title: String): Array[Byte] = {
    val meta =
      s"""<?xml version="1.0" encoding="UTF-8"?>
<office:document-meta xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:dc="http://purl.org/dc/elements/1.1/"><office:meta><dc:title>${xmlEsc(title)}</dc:title><dc:creator>extractous-spark-gen</dc:creator></office:meta></office:document-meta>"""
    zip(Seq(
      "mimetype" -> mime.getBytes("US-ASCII"),
      "content.xml" -> contentXml.getBytes("UTF-8"),
      "meta.xml" -> meta.getBytes("UTF-8")),
      storedNames = Set("mimetype"))
  }

  /** Text document: one heading + body paragraphs. */
  def odt(heading: String, paragraphs: Seq[String], title: String): Array[Byte] = {
    val body = new StringBuilder
    body.append(s"""<text:h text:outline-level="1">${xmlEsc(heading)}</text:h>""")
    paragraphs.foreach(p => body.append(s"<text:p>${xmlEsc(p)}</text:p>"))
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:text>${body.toString}</office:text></office:body></office:document-content>"""
    pack(OdtMime, content, title)
  }

  /** Spreadsheet: rows of cells, each row one text block. */
  def ods(rows: Seq[Seq[String]], title: String): Array[Byte] = {
    val body = new StringBuilder("""<table:table table:name="Sheet1">""")
    rows.foreach { cells =>
      body.append("<table:table-row>")
      cells.foreach(c => body.append(s"<table:table-cell><text:p>${xmlEsc(c)}</text:p></table:table-cell>"))
      body.append("</table:table-row>")
    }
    body.append("</table:table>")
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:spreadsheet>${body.toString}</office:spreadsheet></office:body></office:document-content>"""
    pack(OdsMime, content, title)
  }

  /** Presentation: one frame paragraph per slide. */
  def odp(slides: Seq[String], title: String): Array[Byte] = {
    val body = new StringBuilder
    slides.zipWithIndex.foreach { case (s, i) =>
      body.append(s"""<draw:page draw:name="page$i"><draw:frame><draw:text-box><text:p>${xmlEsc(s)}</text:p></draw:text-box></draw:frame></draw:page>""")
    }
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:presentation>${body.toString}</office:presentation></office:body></office:document-content>"""
    pack(OdpMime, content, title)
  }
}
