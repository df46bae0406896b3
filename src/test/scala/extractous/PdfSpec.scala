package extractous

import extractous.config.{ExtractorConfig, PdfConfig, PdfOcrStrategy}
import extractous.gen.PdfWriter
import extractous.model.ExtractStatus
import extractous.ocr.{Bmp, GlyphFont, GlyphTemplateOcr}
import extractous.pdf.PdfExtractor
import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {
  private val cfg = ExtractorConfig()

  test("uncompressed text pdf roundtrip") {
    val pdf = PdfWriter.textPdf(Seq("Line one here", "Line two here"), "MyTitle", None, compress = false, markedContent = false)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0)
    assert(r.text == "Line one here\nLine two here")
    assert(r.metadata("dc:title") == Seq("MyTitle"))
    assert(r.metadata("xmpTPg:NPages") == Seq("1"))
  }

  test("flate-compressed content stream") {
    val pdf = PdfWriter.textPdf(Seq("Compressed body text"), "T", None, compress = true, markedContent = false)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.text == "Compressed body text")
  }

  test("escaped characters in literal strings") {
    val pdf = PdfWriter.textPdf(Seq("parens (nested) and \\ backslash"), "T", None, compress = false, markedContent = false)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.text == "parens (nested) and \\ backslash")
  }

  test("annotation text honored and toggleable") {
    val pdf = PdfWriter.textPdf(Seq("Body"), "T", Some("A note"), compress = false, markedContent = false)
    val on = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(on.text == "Body\nA note")
    val off = PdfExtractor.extract(pdf, cfg.copy(pdf = PdfConfig(extractAnnotationText = false)), GlyphTemplateOcr)
    assert(off.text == "Body")
  }

  test("two-column layout reads left column first") {
    // hand-built content stream: 3 lines at x=72, 3 lines at x=400
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 72 720 Tm (L one) Tj
        |1 0 0 1 72 706 Tm (L two) Tj
        |1 0 0 1 72 692 Tm (L three) Tj
        |1 0 0 1 400 720 Tm (R one) Tj
        |1 0 0 1 400 706 Tm (R two) Tj
        |1 0 0 1 400 692 Tm (R three) Tj
        |ET""".stripMargin
    val pdf = twoColPdf(content)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.text == "L one\nL two\nL three\nR one\nR two\nR three")
  }

  private def twoColPdf(content: String): Array[Byte] = {
    val body = content.getBytes("US-ASCII")
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes("US-ASCII"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length} >> stream\n")
    sb.write(body)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n")
    sb.toByteArray
  }

  test("TJ array with kerning inserts word gap on large adjustment") {
    val content = "BT /F1 12 Tf 72 720 Td [(Hel) -50 (lo) -400 (world)] TJ ET"
    val pdf = twoColPdf(content)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.text == "Hello world")
  }

  test("scanned pdf: NoOcr yields empty, Auto runs OCR, OcrOnly runs OCR") {
    val img = Bmp.encode(GlyphFont.render(Seq("SCAN 7", "hello")))
    val pdf = PdfWriter.scannedPdf(img)
    val no = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(no.text == "")
    val auto = PdfExtractor.extract(pdf, cfg.copy(pdf = PdfConfig(ocrStrategy = PdfOcrStrategy.Auto)), GlyphTemplateOcr)
    assert(auto.text == "SCAN 7\nhello")
    val only = PdfExtractor.extract(pdf, cfg.copy(pdf = PdfConfig(ocrStrategy = PdfOcrStrategy.OcrOnly)), GlyphTemplateOcr)
    assert(only.text == "SCAN 7\nhello")
  }

  test("ocr-auto is a PER-PAGE predicate: mixed doc uses text path on page 1, OCR on page 2") {
    val img = Bmp.encode(GlyphFont.render(Seq("page two scan")))
    val pdf = PdfWriter.mixedPdf(Seq("Page one embedded"), img)
    val auto = PdfExtractor.extract(pdf, cfg.copy(pdf = PdfConfig(ocrStrategy = PdfOcrStrategy.Auto)), GlyphTemplateOcr)
    assert(auto.text == "Page one embedded\npage two scan")
    assert(auto.metadata("xmpTPg:NPages") == Seq("2"))
    // NoOcr: only the embedded text page contributes
    val no = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(no.text == "Page one embedded")
    // OcrOnly: only the scanned page contributes
    val only = PdfExtractor.extract(pdf, cfg.copy(pdf = PdfConfig(ocrStrategy = PdfOcrStrategy.OcrOnly)), GlyphTemplateOcr)
    assert(only.text == "page two scan")
  }

  test("ocr-auto skips OCR when page has embedded text") {
    val pdf = PdfWriter.textPdf(Seq("Embedded"), "T", None, compress = false, markedContent = false)
    val r = PdfExtractor.extract(pdf, cfg.copy(pdf = PdfConfig(ocrStrategy = PdfOcrStrategy.Auto)), GlyphTemplateOcr)
    assert(r.text == "Embedded")
  }

  test("object-stream (ObjStm) PDFs: compressed catalog/page objects are found") {
    val inner = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val offsets = inner.scanLeft(0)((acc, s) => acc + s.length + 1).init
    val header = inner.indices.map(i => s"${i + 1} ${offsets(i)}").mkString(" ") + " "
    val body = header + inner.mkString(" ") + " "
    val first = header.length
    val content = "BT /F1 12 Tf 72 720 Td (From objstm) Tj ET"
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"5 0 obj << /Type /ObjStm /N 3 /First $first /Length ${body.length} >>\nstream\n$body\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n")
    val r = PdfExtractor.extract(sb.toByteArray, cfg, GlyphTemplateOcr)
    assert(r.text == "From objstm")
  }

  test("corrupt pdf yields -4, not an exception") {
    val r = PdfExtractor.extract("%PDF-1.4\ngarbage only".getBytes("US-ASCII"), cfg, GlyphTemplateOcr)
    assert(r.status == ExtractStatus.ExtractionFailed)
    assert(r.text == "")
  }

  test("inline image count metadata with unique dedup") {
    val img = Bmp.encode(GlyphFont.render(Seq("X")))
    val pdf = PdfWriter.scannedPdf(img)
    val c = cfg.copy(pdf = PdfConfig(extractInlineImages = true))
    val r = PdfExtractor.extract(pdf, c, GlyphTemplateOcr)
    assert(r.metadata("X-Image-Count") == Seq("1"))
  }

  test("encrypted pdf RC4-40 (V1/R2, empty user password): text and title decrypt") {
    val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
      Seq("Encrypted line one", "with (parens) and \\ slash"), "SecTitle", rev = 2)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0)
    assert(r.text == "Encrypted line one\nwith (parens) and \\ slash")
    assert(r.metadata("dc:title") == Seq("SecTitle"))
  }

  test("encrypted pdf RC4-128 (V2/R3, Flate-then-encrypt): text and title decrypt") {
    val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
      Seq("Stronger key body"), "SecTitle3", rev = 3)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0)
    assert(r.text == "Stronger key body")
    assert(r.metadata("dc:title") == Seq("SecTitle3"))
    assert(r.metadata("pdf:producer") == Seq("extractous-spark-gen"))
  }

  test("encrypted pdf with an XRef-STREAM trailer (PDF 1.5+, no `trailer` keyword) still decrypts") {
    // Acrobat 6+ writes cross-reference streams; /Encrypt lives in the XRef
    // stream's dict. A reader that only hunts the `trailer` keyword would
    // skip decryption and emit RC4 ciphertext as text.
    for (rev <- Seq(2, 3)) {
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
        Seq("XRef stream body", "second line"), "XSTitle", rev = rev, xrefStream = true)
      assert(!new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1).contains("trailer"))
      val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
      assert(r.status == 0, s"rev=$rev: ${r.error}")
      assert(r.text == "XRef stream body\nsecond line", s"rev=$rev")
      assert(r.metadata("dc:title") == Seq("XSTitle"))
    }
  }

  test("UNencrypted pdf with an XRef-stream trailer parses (fallback must not break plain files)") {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val content = "BT /F1 12 Tf 72 720 Td\n(plain xref body) Tj\nET".getBytes(iso)
    val streamObj = s"<< /Length ${content.length} >>\nstream\n".getBytes(iso) ++
      content ++ "\nendstream".getBytes(iso)
    val pdf = PdfWriter.assembleObjectsXrefStream(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(iso),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(iso),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>".getBytes(iso),
      streamObj), "/Root 1 0 R")
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0, r.error)
    assert(r.text == "plain xref body")
  }

  test("encrypted pdf AES-128 (V4/R4 /AESV2 crypt filter): text and title decrypt") {
    val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
      Seq("AES line one", "with (parens) and \\ slash"), "AesTitle", rev = 4)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0, r.error)
    assert(r.text == "AES line one\nwith (parens) and \\ slash")
    assert(r.metadata.get("dc:title").contains(Seq("AesTitle")))
  }

  test("encrypted pdf AES-256 (V5/R6 /AESV3, PDF 2.0): text and title decrypt") {
    val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
      Seq("Top secret to nobody", "second line"), "R6Title", rev = 6)
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0, r.error)
    assert(r.text == "Top secret to nobody\nsecond line")
    assert(r.metadata.get("dc:title").contains(Seq("R6Title")))
  }

  test("AES stream whose ciphertext ENDS with 0x0D survives (trailing-EOL strip must not eat data bytes)") {
    // the recovery scan's endstream-marker fallback strips one trailing
    // \n\r — fine for text/RC4, fatal for AES where losing a byte breaks
    // (len-16)%16==0; the direct-/Length path must win. Probe texts until
    // the content ciphertext's last byte is 0x0D (p≈1/256 per candidate).
    val hit = (0 until 4096).view.map { i =>
      val lines = Seq(s"probe text $i", "second line")
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(lines, s"T$i", rev = 4)
      val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      val es = s.indexOf("\nendstream")
      (lines, pdf, es > 0 && pdf(es - 1) == 0x0d.toByte)
    }.find(_._3)
    assert(hit.isDefined, "no probe produced a 0x0D-final ciphertext in 4096 tries")
    val (lines, pdf, _) = hit.get
    val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
    assert(r.status == 0, r.error)
    assert(r.text == lines.mkString("\n"))
  }

  test("encrypted pdf with a NON-empty user password is rejected with -4, never garbage") {
    for (rev <- Seq(2, 3, 4, 6)) {
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
        Seq("locked away"), "T", rev = rev, userPwd = "hunter2")
      val r = PdfExtractor.extract(pdf, cfg, GlyphTemplateOcr)
      assert(r.status == ExtractStatus.ExtractionFailed, s"rev=$rev must fail")
      assert(r.text == "")
      assert(r.error.contains("password"))
    }
  }

  test("password-protected pdf opens with the USER password via PdfConfig.password (all four generations)") {
    for (rev <- Seq(2, 3, 4, 6)) {
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
        Seq("credentialed body", "line two"), s"PwTitle$rev", rev = rev,
        userPwd = "hunter2", ownerPwd = "root-cred")
      val c = cfg.copy(pdf = PdfConfig(password = "hunter2"))
      val r = PdfExtractor.extract(pdf, c, GlyphTemplateOcr)
      assert(r.status == 0, s"rev=$rev: ${r.error}")
      assert(r.text == "credentialed body\nline two", s"rev=$rev")
      assert(r.metadata.get("dc:title").contains(Seq(s"PwTitle$rev")))
    }
  }

  test("password-protected pdf opens with the OWNER password (Algorithm 7 legacy, Algorithm 12 V5)") {
    for (rev <- Seq(2, 3, 4, 6)) {
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
        Seq("owner-side open"), s"OwTitle$rev", rev = rev,
        userPwd = "hunter2", ownerPwd = "root-cred")
      val c = cfg.copy(pdf = PdfConfig(password = "root-cred"))
      val r = PdfExtractor.extract(pdf, c, GlyphTemplateOcr)
      assert(r.status == 0, s"rev=$rev: ${r.error}")
      assert(r.text == "owner-side open", s"rev=$rev")
    }
  }

  test("WRONG password still refuses with -4 and an honest message, never garbage") {
    for (rev <- Seq(2, 3, 4, 6)) {
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
        Seq("locked away"), "T", rev = rev, userPwd = "hunter2", ownerPwd = "root-cred")
      val c = cfg.copy(pdf = PdfConfig(password = "hunter3"))
      val r = PdfExtractor.extract(pdf, c, GlyphTemplateOcr)
      assert(r.status == ExtractStatus.ExtractionFailed, s"rev=$rev must fail")
      assert(r.text == "")
      assert(r.error.contains("password"))
    }
  }

  test("a supplied password does not break the EMPTY-user-password stratum (tried first)") {
    for (rev <- Seq(2, 3, 4, 6)) {
      val pdf = extractous.gen.PdfEncWriter.encryptedTextPdf(
        Seq("open to anyone"), "ETitle", rev = rev)
      val c = cfg.copy(pdf = PdfConfig(password = "irrelevant-cred"))
      val r = PdfExtractor.extract(pdf, c, GlyphTemplateOcr)
      assert(r.status == 0, s"rev=$rev: ${r.error}")
      assert(r.text == "open to anyone", s"rev=$rev")
    }
  }

  test("unknown crypt-filter method (/CFM /AESV9) is refused with -8 unsupported format") {
    val r = PdfExtractor.extract(extractous.gen.PdfEncWriter.unknownCfmEncryptedPdf(), cfg, GlyphTemplateOcr)
    assert(r.status == ExtractStatus.UnsupportedFormat)
    assert(r.text == "")
    assert(r.error.contains("crypt-filter"))
  }
}
