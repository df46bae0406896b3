package extractous.gen

import extractous.config._
import extractous.model.{ExtractStatus, WebPage}
import extractous.ocr.{Bmp, Gif, GlyphFont, Jpeg, Png, Tiff}
import extractous.sniff.MimeSniffer
import org.apache.spark.sql.{Dataset, SparkSession}
import java.io.ByteArrayOutputStream
import java.sql.Timestamp

/** Deterministic Common-Crawl-style corpus generator (FIXTURES.md). Payload
  * bytes are a pure function of `(doc_id, text, lang)` drawn from the driver's
  * `documents.parquet`, so:
  *   - the same seed table ⇒ byte-identical corpus at any parallelism;
  *   - the EXPECTED extracted text per url is a closed-form function of
  *     `(doc_id, text, lang)` that is also expressible in ANSI SQL — which makes
  *     the flagship extraction queries DuckDB-oracle-checkable end-to-end.
  *
  * Format mix (by `doc_id % 100`): 0-51 HTML; 52 Markdown; 53 RFC-822 email;
  * 54 EPUB; 55-59 plain UTF-8; 60 unlabeled GBK; 61 legacy .xls; 62 legacy .ppt; 63 unlabeled
  * ISO-8859-1; 64 unlabeled Shift-JIS; 65-66 UTF-16LE; 67 UTF-16BE; 68-69
  * windows-1252; 70-81 digital PDF; 82-86 DOCX; 87 .doc; 88 ODT; 89 ODP;
  * 90-95 scanned image (BMP/PNG/JPEG/GIF/TIFF by doc_id % 5); 96-97 scanned
  * PDF; 98 empty; 99 corrupt — FIXTURES.md §2.
  */
object CorpusGen {

  /** Language-marker stopword line injected into HTML pages; the language-ID
    * query recovers `lang` from these (ground truth = the documents.lang col).
    */
  def stopLine(lang: String): String = lang match {
    case "en" => "the and of to in"
    case "de" => "der die und nicht das"
    case "es" => "el la los y no"
    case "fr" => "le la les et ne"
    case "zh" => "的 了 是 在 不"
    case _    => "the and of to in"
  }

  def kindOf(id: Long): String = {
    val m = (id % 100).toInt
    if (m < 52) "html"
    else if (m < 53) "markdown"
    else if (m < 54) "eml"
    else if (m < 55) "epub"
    else if (m < 60) "plain"
    else if (m < 61) "gbk"
    else if (m < 62) "xls"
    else if (m < 63) "ppt"
    else if (m < 64) "latin1"
    else if (m < 65) "sjis"
    else if (m < 67) "utf16le"
    else if (m < 68) "utf16be"
    else if (m < 70) "cp1252"
    else if (m < 82) "pdf"
    else if (m < 87) "docx"
    else if (m < 88) "doc"
    else if (m < 89) "odt"
    else if (m < 90) "odp"
    else if (m < 96) "image"
    else if (m < 98) "scanned_pdf"
    else if (m == 98) "empty"
    else "corrupt"
  }

  /** Non-ASCII lead-in for the windows-1252 rows: exercises the 0x80-0x9F
    * cp1252 specials (€ –) and Latin-1 accents; seed texts are pure ASCII so
    * the expected decode is `prefix + text` in closed form.
    */
  val Cp1252Prefix = "café € – ñ "

  /** Lead-in for the unlabeled ISO-8859-1 rows: accents only from 0xA0-0xFF
    * (where latin-1 and cp1252 agree byte-for-byte), each followed by ASCII
    * so the Shift-JIS structural check can never match. The detector labels
    * these windows-1252 — the superset every real detector (ICU/Tika) picks
    * for unlabeled western 8-bit text — and the decode is identical.
    */
  val Latin1Prefix = "voilà señor cédille "

  /** Lead-in for the unlabeled Shift-JIS rows: 8 double-byte characters
    * (hiragana + kanji), well past the detector's 4-pair minimum, followed by
    * the pure-ASCII seed text.
    */
  val SjisPrefix = "こんにちは日本語 "

  /** Lead-in for the unlabeled GBK rows: 7 hanzi whose GBK lead bytes sit in
    * Shift-JIS's single-byte katakana range — the payload is structurally
    * valid SJIS with ZERO pairs, so it falls through the SJIS rung (pair
    * minimum) and the GBK rung catches it. Order-dependence by design.
    */
  val GbkPrefix = "中文语料库处理 "

  /** Host-skewed url: host-0 carries ~50% of pages (Zipf-ish head), the rest
    * spread over host-1..host-9 — exercises the salted-repartition path.
    */
  def urlOf(id: Long): String = {
    val h = if (id % 2 == 0) 0L else 1L + id % 9
    s"https://host-$h.example/doc-$id"
  }

  /** UTC timestamps spread over a 30-day window (partition column). */
  def tsOf(id: Long): Timestamp = {
    val epoch = 1704067200L // 2024-01-01T00:00:00Z
    new Timestamp((epoch + (id % 30) * 86400L + (id * 7) % 86400) * 1000L)
  }

  def titleOf(id: Long, lang: String): String = s"Document $id ($lang)"

  private def htmlEsc(s: String): String = DocxWriter.xmlEsc(s)

  def htmlPayload(id: Long, text: String, lang: String): Array[Byte] = {
    val page =
      s"""<!DOCTYPE html>
<html lang="$lang"><head><title>${htmlEsc(titleOf(id, lang))}</title>
<meta name="description" content="Synthetic page $id">
<meta charset="utf-8">
</head><body>
<header class="masthead"><a href="/">Home</a> <a href="/about">About</a></header>
<nav><ul><li><a href="/section-a">Section A</a></li><li><a href="/section-b">Section B</a></li></ul></nav>
<div class="sidebar"><a href="/promo">Subscribe now</a> limited offer click here</div>
<article>
<h1>Document $id</h1>
<p>${stopLine(lang)}</p>
<p>${htmlEsc(text)}</p>
</article>
<footer>Copyright 2024 Example Corp <a href="/tos">Terms of Service</a> <a href="/privacy">Privacy</a></footer>
</body></html>
"""
    page.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Quoted-printable: '=' escaped, soft line breaks at ~70 chars placed so
    * an escape sequence is never split — decodes back to the input exactly.
    */
  private def qp(s: String): String = {
    val sb = new StringBuilder
    var lineLen = 0
    s.foreach { c =>
      val tok = if (c == '=') "=3D" else c.toString
      if (lineLen + tok.length > 70) { sb.append("=\r\n"); lineLen = 0 }
      sb.append(tok); lineLen += tok.length
    }
    sb.toString
  }

  def mdPayload(id: Long, text: String): Array[Byte] =
    (s"# Document $id\n\n$text\n\n- alpha $id\n- beta $id\n\n" +
      s"[Link $id](https://example.com/$id) with `inline` and **bold** text\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Alternating ids (by id/100, because ids ≡ k mod 100 share parity):
    * multipart/alternative with a quoted-printable text/plain part and a
    * base64 text/html alternative, vs a bare single-part message. Both
    * extract to "Document <id>\n<text>".
    */
  def emlPayload(id: Long, text: String): Array[Byte] = {
    val msg =
      if ((id / 100) % 2 == 0) {
        val b = s"b$id"
        s"From: crawler@example.com\r\nTo: archive@example.com\r\nSubject: Document $id\r\n" +
          s"MIME-Version: 1.0\r\nContent-Type: multipart/alternative; boundary=\"$b\"\r\n\r\n" +
          s"--$b\r\nContent-Type: text/plain; charset=utf-8\r\nContent-Transfer-Encoding: quoted-printable\r\n\r\n" +
          qp(text) + s"\r\n--$b\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: base64\r\n\r\n" +
          java.util.Base64.getMimeEncoder.encodeToString(
            s"<p>${htmlEsc(text)}</p>".getBytes(java.nio.charset.StandardCharsets.UTF_8)) +
          s"\r\n--$b--\r\n"
      } else
        s"From: crawler@example.com\r\nSubject: Document $id\r\n\r\n$text\r\n"
    msg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def payload(id: Long, text: String, lang: String): Array[Byte] = kindOf(id) match {
    case "html"  => htmlPayload(id, text, lang)
    case "markdown" => mdPayload(id, text)
    case "eml" => emlPayload(id, text)
    case "epub" => EpubWriter.epub(s"Document $id", Seq(text), s"Second chapter $id", titleOf(id, lang))
    case "plain" => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case "xls" => XlsWriter.xls(Seq(s"Document $id", text))
    case "ppt" => PptWriter.ppt(Seq(s"Document $id", text))
    case "latin1" =>
      (Latin1Prefix + text).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    case "sjis" =>
      (SjisPrefix + text).getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    case "gbk" =>
      (GbkPrefix + text).getBytes(java.nio.charset.Charset.forName("GBK"))
    case "utf16le" =>
      Array[Byte](0xff.toByte, 0xfe.toByte) ++ text.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    case "utf16be" =>
      Array[Byte](0xfe.toByte, 0xff.toByte) ++ text.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    case "cp1252" =>
      (Cp1252Prefix + text).getBytes(java.nio.charset.Charset.forName("windows-1252"))
    case "pdf" =>
      PdfWriter.textPdf(
        lines = Seq(s"Document $id", text),
        title = titleOf(id, lang),
        annot = if (id % 3 == 0) Some(s"Note $id") else None,
        compress = id % 2 == 0,
        markedContent = id % 5 == 0)
    case "docx" =>
      DocxWriter.docx(
        paragraphs = Seq(s"Document $id", text),
        title = titleOf(id, lang),
        deleted = s"DELETED $id", moved = s"MOVED $id", shape = s"SHAPE $id")
    case "doc" => DocWriter.doc(Seq(s"Document $id", text))
    case "odt" => OdfWriter.odt(s"Document $id", Seq(text), titleOf(id, lang))
    case "odp" => OdfWriter.odp(Seq(s"Document $id", text), titleOf(id, lang))
    case "image" =>
      val g = GlyphFont.render(Seq(s"DOC $id", text.take(40)), noiseSeed = if (id % 5 == 0) id else 0L)
      (id % 5) match {
        case 0 => Bmp.encode(g)
        case 1 => Png.encode(g)
        case 2 => Jpeg.encode(g)
        case 3 => Gif.encode(g)
        // id/100 parity: ids ≡ 94 mod 100 are all even, so id % 2 would pin
        // one compression forever — this way both TIFF paths ride the corpus
        case _ => Tiff.encode(g, packBits = (id / 100) % 2 == 0)
      }
    case "scanned_pdf" =>
      val g = GlyphFont.render(Seq(s"SCAN $id", text.take(20)))
      PdfWriter.scannedPdf(Bmp.encode(g))
    case "empty" => Array.emptyByteArray
    case "corrupt" =>
      (id % 3) match {
        case 0 => "%PDF-1.4\nthis is not a real pdf body".getBytes("US-ASCII")
        case 1 => Array[Byte]('P', 'K', 3, 4) ++ Array.tabulate[Byte](64)(i => ((i * 37 + 11) % 251).toByte)
        // 0x81/0x8D are undefined in windows-1252 AND invalid UTF-8 ⇒ the
        // charset ladder cannot rescue this payload: status -2 stays reachable
        case _ => ("corrupt text document " * 4).getBytes("US-ASCII") ++ Array[Byte](0x81.toByte, 0x8d.toByte)
      }
  }

  /** The flagship pipeline config: boilerplate-stripped HTML + OCR-Auto PDFs. */
  val flagshipConfig: ExtractorConfig = ExtractorConfig(
    pdf = PdfConfig(ocrStrategy = PdfOcrStrategy.Auto))

  /** Engine-independent expected extraction under [[flagshipConfig]] — the
    * Scala twin of the DuckDB oracle SQL in graft.SparkEntry.
    */
  def expectedText(id: Long, text: String, lang: String): String = kindOf(id) match {
    case "html"                  => s"Document $id\n${stopLine(lang)}\n$text"
    case "markdown"              => s"Document $id\n$text\nalpha $id\nbeta $id\nLink $id with inline and bold text"
    case "eml"                   => s"Document $id\n$text"
    case "epub"                  => s"Document $id\n$text\nSecond chapter $id"
    case "plain"                 => text
    case "xls" | "ppt"           => s"Document $id\n$text"
    case "latin1"                => Latin1Prefix + text
    case "sjis"                  => SjisPrefix + text
    case "gbk"                   => GbkPrefix + text
    case "utf16le" | "utf16be"   => text
    case "cp1252"                => Cp1252Prefix + text
    case "pdf"                   => s"Document $id\n$text" + (if (id % 3 == 0) s"\nNote $id" else "")
    case "docx"                  => s"Document $id\n$text\nSHAPE $id"
    case "doc" | "odt" | "odp"   => s"Document $id\n$text"
    case "image"                 => s"DOC $id\n${text.take(40).reverse.dropWhile(_ == ' ').reverse}"
    case "scanned_pdf"           => s"SCAN $id\n${text.take(20).reverse.dropWhile(_ == ' ').reverse}"
    case _                       => ""
  }

  def expectedStatus(id: Long): Int = kindOf(id) match {
    case "corrupt" => if (id % 3 == 2) ExtractStatus.InvalidUtf8 else ExtractStatus.ExtractionFailed
    case _         => ExtractStatus.Ok
  }

  def expectedContentType(id: Long): String = kindOf(id) match {
    case "html"                            => MimeSniffer.Html
    case "markdown"                        => MimeSniffer.Markdown
    case "eml"                             => MimeSniffer.Eml
    case "epub"                            => MimeSniffer.Epub
    case "plain" | "latin1" | "sjis" | "gbk" | "utf16le" | "utf16be" | "cp1252" => MimeSniffer.Plain
    case "xls"                             => MimeSniffer.Xls
    case "ppt"                             => MimeSniffer.Ppt
    case "pdf"                             => MimeSniffer.Pdf
    case "docx"                            => MimeSniffer.Docx
    case "doc"                             => MimeSniffer.Doc
    case "odt"                             => MimeSniffer.Odt
    case "odp"                             => MimeSniffer.Odp
    case "image" =>
      (id % 5) match {
        case 0 => MimeSniffer.Bmp
        case 1 => MimeSniffer.Png
        case 2 => MimeSniffer.Jpeg
        case 3 => MimeSniffer.Gif
        case _ => MimeSniffer.Tiff
      }
    case "scanned_pdf" => MimeSniffer.Pdf
    case "empty"       => MimeSniffer.Empty
    case "corrupt" =>
      (id % 3) match {
        case 0 => MimeSniffer.Pdf
        case 1 => MimeSniffer.Zip
        case _ => MimeSniffer.Plain
      }
  }

  /** XLSX with two shared-string rows: title + text (expected extraction =
    * "Document <id>\n<text>").
    */
  def xlsxPayload(id: Long, text: String): Array[Byte] = {
    val e = DocxWriter.xmlEsc _
    DocxWriter.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
      "xl/sharedStrings.xml" ->
        s"""<?xml version="1.0"?><sst><si><t>Document $id</t></si><si><t>${e(text)}</t></si></sst>""".getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" ->
        """<?xml version="1.0"?><worksheet><sheetData><row><c t="s"><v>0</v></c></row><row><c t="s"><v>1</v></c></row></sheetData></worksheet>""".getBytes("UTF-8")))
  }

  /** PPTX with two slides: title + text (expected = "Document <id>\n<text>"). */
  def pptxPayload(id: Long, text: String): Array[Byte] = {
    val e = DocxWriter.xmlEsc _
    def slide(t: String) =
      s"""<?xml version="1.0"?><p:sld xmlns:p="p" xmlns:a="a"><p:txBody><a:p><a:r><a:t>$t</a:t></a:r></a:p></p:txBody></p:sld>"""
    DocxWriter.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
      "ppt/slides/slide1.xml" -> slide(s"Document $id").getBytes("UTF-8"),
      "ppt/slides/slide2.xml" -> slide(e(text)).getBytes("UTF-8")))
  }

  /** PDF with 2 + id%3 distinct images, each drawn twice — probes inline-image
    * extraction and digest dedup (unique → n, all draws → 2n).
    */
  def multiImagePdfPayload(id: Long): Array[Byte] = {
    val n = 2 + (id % 3).toInt
    val images = (0 until n).map(i => Bmp.encode(GlyphFont.render(Seq(s"IMG $i OF DOC $id"))))
    PdfWriter.multiImagePdf(images, drawsPerImage = 2)
  }

  /** PDF with /H1 + /P marked-content scopes per line (x_pdf_marked). */
  def markedPdfPayload(id: Long, text: String): Array[Byte] =
    PdfWriter.markedPdf(s"Document $id", Seq(text), titleOf(id, "en"))

  /** Standard-security encrypted PDF, empty user password (the crawl's
    * openable encrypted stratum), rotating the handler generation by id:
    * RC4-40 (V1/R2, uncompressed), RC4-128 (V2/R3, Flate-then-encrypt),
    * AES-128 (V4/R4 /AESV2 crypt filter), AES-256 (V5/R6 /AESV3, PDF 2.0)
    * (x_pdf_encrypted).
    */
  def encryptedPdfPayload(id: Long, text: String): Array[Byte] =
    PdfEncWriter.encryptedTextPdf(
      lines = Seq(s"Document $id", text),
      title = titleOf(id, "en"),
      rev = Array(2, 3, 4, 6)((id % 4).toInt))

  /** Fixed credentials for the password-protected stratum (x_pdf_password):
    * constants because PdfConfig.password is plan-level, not per-row —
    * per-row variation comes from the handler-generation rotation.
    */
  val PdfUserPwd = "user-secret-42"
  val PdfOwnerPwd = "owner-secret-42"

  /** Genuinely password-protected PDF (non-empty USER password, so nothing
    * opens without a credential), rotating the same four handler
    * generations as [[encryptedPdfPayload]].
    */
  def passwordPdfPayload(id: Long, text: String): Array[Byte] =
    PdfEncWriter.encryptedTextPdf(
      lines = Seq(s"Document $id", text),
      title = titleOf(id, "en"),
      rev = Array(2, 3, 4, 6)((id % 4).toInt),
      userPwd = PdfUserPwd,
      ownerPwd = PdfOwnerPwd)

  /** DOCX carrying a vbaProject.bin with one printable macro line on even ids
    * (x_office_macros).
    */
  def docxMacrosPayload(id: Long, text: String): Array[Byte] =
    DocxWriter.docx(
      paragraphs = Seq(s"Document $id", text),
      title = titleOf(id, "en"),
      deleted = s"DELETED $id", moved = s"MOVED $id", shape = s"SHAPE $id",
      macros = if (id % 2 == 0) Some(s"Sub Doc$id(): MsgBox 42: End Sub") else None)

  /** Scanned image with an extra all-speckle row: raw OCR reads the bait cell
    * as the reject marker, despeckling erases it (x_ocr_preprocess).
    */
  def baitImagePayload(id: Long, text: String): Array[Byte] =
    Bmp.encode(GlyphFont.renderWithBait(Seq(s"DOC $id", text.take(20))))

  /** Scanned image with one out-of-charset row for the language-model probe
    * (x_ocr_lang): digits recognize under "num", the letter row rejects.
    */
  def langImagePayload(id: Long): Array[Byte] =
    Bmp.encode(GlyphFont.render(Seq(s"$id", "e")))

  /** 2x-DPI scan of the page — recognizable only at density=600 (x_ocr_density). */
  def densityImagePayload(id: Long, text: String): Array[Byte] =
    Bmp.encode(GlyphFont.render(Seq(s"DOC $id", text.take(20)), scale = 2))

  /** gzip-wrapped corrupt PDF on even ids, bare corrupt PDF on odd — probes
    * the error debug chain's context frames (x_error_chain).
    */
  def corruptChainPayload(id: Long): Array[Byte] = {
    val corrupt = "%PDF-1.4\nthis is not a real pdf body".getBytes("US-ASCII")
    if (id % 2 == 0) {
      val bos = new ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(corrupt); gz.close()
      bos.toByteArray
    } else corrupt
  }

  /** Archive-recursion payload (x_archive): a 3-member archive — an HTML
    * page, a plain-text note, and a gzip-wrapped text (nested wrapper, depth
    * 2) — as ZIP / ustar TAR / 7z / store-mode RAR5 by (id/100) mod 4.
    * Expected text is the members' extractions concatenated in archive
    * order, all closed-form.
    */
  def archivePayload(id: Long, text: String, lang: String): Array[Byte] = {
    val gz = {
      val bos = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)); g.close()
      bos.toByteArray
    }
    val members = Seq(
      "page.html" -> htmlPayload(id, text, lang),
      "note.txt" -> text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      "extra.txt.gz" -> gz)
    ((id / 100) % 4) match {
      case 0 => DocxWriter.zip(members)
      case 1 =>
        // the tar stratum rotates plain / .tar.xz (check types rotating
        // through all four spec variants) / .tar.bz2 / .tar.zst / .tar.lz4 /
        // .tar.sz — extracted text and reported content type are
        // wrapper-invariant (every rung re-dispatches on the inner tar), so
        // the closed-form oracle is unchanged while all six containers flow
        // through the corpus
        val tar = TarWriter.tar(members)
        (id % 6) match {
          case 0 => tar
          case 1 => XzWriter.xz(tar, checkType = Seq(1, 4, 10, 0)(((id / 3) % 4).toInt))
          case 2 => BzipWriter.bz2(tar, level = 1 + (id % 9).toInt)
          case 3 => ZstdWriter.zst(tar)
          case 4 => Lz4Writer.lz4(tar)
          case _ => SnappyWriter.sz(tar)
        }
      case 2 =>
        // rotate the 7z stratum through its coder/layout variants — the
        // extracted text is container-invariant, so the closed-form oracle
        // is unchanged while store, LZMA, LZMA2, BCJ/Delta filter chains
        // and compressed-header archives all flow through the corpus
        (id % 6) match {
          case 0 => SevenZWriter.sevenZ(members)
          case 1 => SevenZWriter.sevenZ(members, coder = "lzma")
          case 2 => SevenZWriter.sevenZ(members, coder = "lzma2")
          case 3 => SevenZWriter.sevenZ(members, coder = "bcj-lzma")
          case 4 => SevenZWriter.sevenZ(members, coder = "delta-lzma2")
          case _ => SevenZWriter.sevenZ(members, coder = "lzma2", encodedHeader = true)
        }
      case _ => RarWriter.rar5(members)
    }
  }

  /** WARC payload (x_warc): a 5-record Common-Crawl-shaped file — warcinfo +
    * request (both skipped structurally), an HTTP response carrying the HTML
    * page (gzip Content-Encoding every 3rd doc — crawls store raw wire
    * bytes), a text/plain conversion record, and a chunked-transfer HTTP
    * response. Whole-file variant by (id/100) mod 3: plain `.warc`,
    * Common-Crawl-style per-record gzip members (`.warc.gz`), or a
    * zstd-wrapped `.warc.zst` (the IIPC warc-zstd shape, frame over the
    * whole file). Expected text (all variants, closed form):
    * `Document $id\n$stop\n$text\n$text\nCrawl note $id`.
    */
  def warcPayload(id: Long, text: String, lang: String): Array[Byte] = {
    val records = warcRecords(id, text, lang)
    val out = new ByteArrayOutputStream()
    ((id / 100) % 3) match {
      case 0 => records.foreach(r => out.write(r))
      case 1 =>
        // Common-Crawl member-per-record gzip: concatenated members must
        // inflate as ONE stream through the gzip wrapper rung
        records.foreach(r => out.write(gzMember(r)))
      case _ =>
        val plain = new ByteArrayOutputStream()
        records.foreach(r => plain.write(r))
        out.write(ZstdWriter.zst(plain.toByteArray))
    }
    out.toByteArray
  }

  /** Russian lead-in for the Cyrillic charset rungs. Lowercase-dominant (as
    * prose is), no ё (KOI8-R maps it at 0xA3, outside the detector's
    * accepted zone — documented miss).
    */
  val CyrPrefix = "привет мир это русский текст "

  /** Unlabeled Cyrillic payload (x_charset_cyr): the same Russian lead-in +
    * ASCII text encoded windows-1251 vs KOI8-R by id/100 parity. The two
    * encodings swap case bands, so detection must pick the right one — a
    * wrong pick decodes the prefix as DIFFERENT (wrong) Cyrillic letters,
    * failing the oracle.
    */
  def cyrPayload(id: Long, text: String): Array[Byte] = {
    val cs = if ((id / 100) % 2 == 0) "windows-1251" else "KOI8-R"
    // non-ASCII corpus chars (zh docs) are unmappable in either encoding —
    // sanitize explicitly (the oracle mirrors with regexp_replace)
    val ascii = text.map(c => if (c >= 0x20 && c < 0x7f) c else '?')
    (CyrPrefix + ascii).getBytes(java.nio.charset.Charset.forName(cs))
  }

  /** iCalendar / vCard payload (x_cal), by id/100 parity. The TEXT value is
    * RFC-escaped (`\,` `\;` `\\` `\n`) and FOLDED at 70 octets (CRLF +
    * space), so the parser's unfold + unescape path is exercised on every
    * row. Expected text: ics → `Document $id\n$text\nRoom $id`;
    * vcf → `Document $id\nExample Corp $id\n$text`.
    */
  def calPayload(id: Long, text: String): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace(",", "\\,").replace(";", "\\;").replace("\n", "\\n")
    // fold joined with a REAL "CRLF + space" — built as a line list, never
    // through stripMargin (a continuation chunk starting with '|' would have
    // its pipe eaten by the margin stripper and break unfolding)
    def fold(line: String): String = line.grouped(70).mkString("\r\n ")
    val lines =
      if ((id / 100) % 2 == 0) Seq(
        "BEGIN:VCALENDAR",
        "VERSION:2.0",
        "PRODID:-//extractousgospark//EN",
        "BEGIN:VEVENT",
        s"UID:doc-$id@example",
        "DTSTART:20240101T000000Z",
        s"SUMMARY:Document $id",
        fold(s"DESCRIPTION:${esc(text)}"),
        s"LOCATION:Room $id",
        "END:VEVENT",
        "END:VCALENDAR")
      else Seq(
        "BEGIN:VCARD",
        "VERSION:4.0",
        s"FN:Document $id",
        s"ORG:Example Corp $id",
        fold(s"NOTE:${esc(text)}"),
        s"EMAIL;TYPE=work:doc$id@example.com",
        "END:VCARD")
    lines.mkString("", "\r\n", "\r\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** The individual records of [[warcPayload]], so the ingest query can pack
    * many documents' records into one `.warc.gz` file per task — the shape a
    * real crawl ships (thousands of pages per file).
    */
  def warcRecords(id: Long, text: String, lang: String): Seq[Array[Byte]] = {
    val CRLF = "\r\n"
    def record(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
      val head = new StringBuilder("WARC/1.0").append(CRLF)
      headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append(CRLF) }
      head.append("Content-Length: ").append(block.length).append(CRLF).append(CRLF)
      val hb = head.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new ByteArrayOutputStream(hb.length + block.length + 4)
      out.write(hb); out.write(block); out.write(CRLF.getBytes); out.write(CRLF.getBytes)
      out.toByteArray
    }
    def http(contentType: String, body: Array[Byte], extra: Seq[String] = Nil): Array[Byte] = {
      val head = (Seq(s"HTTP/1.1 200 OK", s"Content-Type: $contentType") ++ extra)
        .mkString("", CRLF, CRLF) + CRLF
      val hb = head.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new ByteArrayOutputStream(hb.length + body.length)
      out.write(hb); out.write(body)
      out.toByteArray
    }
    val date = "2024-01-01T00:00:00Z"
    val uri = s"https://host-${id % 7}.example/doc/$id"
    val html = htmlPayload(id, text, lang)
    val htmlResp = (id % 3) match {
      case 0 => http("text/html", gzMember(html), Seq("Content-Encoding: gzip"))
      case 1 =>
        // deflate stratum, alternating zlib-wrapped (the RFC meaning) and
        // raw-DEFLATE (the historical-server misreading browsers accept)
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
          (id / 3) % 2 == 1)
        deflater.setInput(html); deflater.finish()
        val out = new ByteArrayOutputStream(html.length)
        val buf = new Array[Byte](8192)
        while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
        deflater.end()
        http("text/html", out.toByteArray, Seq("Content-Encoding: deflate"))
      case _ =>
        // the third stratum rotates identity / zstd / brotli (RFC 8878 and
        // RFC 7932 are the registered HTTP content codings modern servers
        // actually ship — br alone is on the order of a quarter of responses)
        (id / 3) % 3 match {
          case 1 => http("text/html", ZstdWriter.zst(html), Seq("Content-Encoding: zstd"))
          case 2 => http("text/html", BrotliWriter.br(html), Seq("Content-Encoding: br"))
          case _ => http("text/html", html)
        }
    }
    val note = s"Crawl note $id".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // two chunks: split the note at byte 6 ("Crawl ")
    val chunked = {
      val out = new ByteArrayOutputStream()
      def chunk(b: Array[Byte], from: Int, len: Int): Unit = {
        out.write(Integer.toHexString(len).getBytes); out.write(CRLF.getBytes)
        out.write(b, from, len); out.write(CRLF.getBytes)
      }
      chunk(note, 0, 6); chunk(note, 6, note.length - 6)
      out.write("0".getBytes); out.write(CRLF.getBytes); out.write(CRLF.getBytes)
      http("text/plain", out.toByteArray, Seq("Transfer-Encoding: chunked"))
    }
    val records = Seq(
      record(Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date,
        "Content-Type" -> "application/warc-fields"),
        s"software: extractousgospark$CRLF".getBytes),
      record(Seq("WARC-Type" -> "request", "WARC-Target-URI" -> s"<$uri>", "WARC-Date" -> date,
        "Content-Type" -> "application/http; msgtype=request"),
        s"GET /doc/$id HTTP/1.1${CRLF}Host: host-${id % 7}.example$CRLF$CRLF".getBytes),
      record(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> s"<$uri>", "WARC-Date" -> date,
        "Content-Type" -> "application/http; msgtype=response"), htmlResp),
      // distinct URI: a conversion record derives from its response, but an
      // ingest table keyed by url must not see two rows for one key
      record(Seq("WARC-Type" -> "conversion", "WARC-Target-URI" -> s"<${uri}text>", "WARC-Date" -> date,
        "Content-Type" -> "text/plain"),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      record(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> s"<${uri}note>", "WARC-Date" -> date,
        "Content-Type" -> "application/http; msgtype=response"), chunked))
    records
  }

  /** Delimited-text payload (x_csv): CSV vs TSV by id/100 parity; the first
    * data cell is quoted with an embedded delimiter and a doubled quote (the
    * RFC 4180 corners), so a naive line-split parser fails the oracle.
    * Expected text for BOTH variants: `title body` then
    * `Document $id, part "A" $text` (cells joined by single spaces).
    */
  def csvPayload(id: Long, text: String): Array[Byte] = {
    val s =
      if ((id / 100) % 2 == 0)
        s"title,body\r\n\"Document $id, part \"\"A\"\"\",$text\r\n"
      else
        s"title\tbody\nDocument $id, part \"A\"\t$text\n"
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Unix mbox payload (x_mbox): two messages behind `From ` envelope lines;
    * the second body carries a `>From`-stuffed line the reader must unstuff.
    */
  def mboxPayload(id: Long, text: String): Array[Byte] = {
    (s"From crawler@example.com Thu Jan  1 00:00:00 2026\n" +
      s"From: crawler@example.com\nSubject: Document $id\n\n$text\n" +
      s"From archiver@example.com Thu Jan  1 00:00:01 2026\n" +
      s"From: archiver@example.com\nSubject: Re: Document $id\n\n$text\n" +
      s">From the archive of $id\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Synthetic multimodal payloads — pure functions of doc_id so expectations
    * stay SQL-expressible (see pipeline.Multimodal for the container formats).
    */
  def videoPayload(id: Long): Array[Byte] = {
    val n = 1 + (id % 3).toInt
    val frames = (0 until n).map(j => Jpeg.encode(GlyphFont.render(Seq(s"F$j $id"))))
    val g0 = GlyphFont.render(Seq(s"F0 $id"))
    extractous.pipeline.Multimodal.Avi.encode(frames, g0.width, g0.height)
  }

  def audioPayload(id: Long): Array[Byte] =
    extractous.pipeline.Multimodal.Wav.encode(
      sampleRate = 8000 + (id % 4).toInt * 4000,
      channels = 1 + (id % 2).toInt,
      bits = 16,
      nSamples = 100 + (id % 50).toInt)

  def webPage(id: Long, text: String, lang: String): WebPage =
    WebPage(urlOf(id), tsOf(id), payload(id, text, lang), "", lang)

  /** Distributed corpus build: a narrow per-row map over the seed table — no
    * shuffle, deterministic under any partitioning.
    */
  def corpus(spark: SparkSession, sfDir: String): Dataset[WebPage] =
    corpusFrom(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Same, over an arbitrary (doc_id, text, lang) frame (lets the bench feed
    * realistic page sizes without touching the oracle corpus).
    */
  def corpusFrom(docsDf: org.apache.spark.sql.DataFrame): Dataset[WebPage] = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    docsDf.select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) => webPage(id, text, lang) }
  }
}
