package extractous.core

import extractous.config.{CharSet, ExtractorConfig, PdfOcrStrategy}
import extractous.html.HtmlExtractor
import extractous.model.{ExtractResult, ExtractStatus}
import extractous.ocr.{GlyphTemplateOcr, Ocr}
import extractous.office.OfficeExtractor
import extractous.pdf.PdfExtractor
import extractous.sniff.MimeSniffer
import extractous.text.{Encoding, Normalize, TextEmitter, XmlEmitter}

/** The flagship pure function: `(payload bytes, config) → ExtractResult` —
  * the Spark-native replacement for the reference's stateful Extractor handle
  * (/root/reference/extractor.go:452-481 ExtractBytesToString). Per-row,
  * side-effect-free, broadcast-safe: the unit of parallelism is the Spark task,
  * exactly as the reference's unit is one extractor per thread
  * (/root/reference/extractor.go:18-40).
  *
  * A poison document NEVER throws out of this function — failures map to the
  * reference status-code space (status column, /root/reference/ffi/src/errors.rs:8-18).
  */
object Extract {

  def apply(bytes: Array[Byte], cfg: ExtractorConfig = ExtractorConfig.default, ocr: Ocr = GlyphTemplateOcr): ExtractResult = {
    val encoded = dispatchSafe(bytes, cfg, ocr, depth = 0)
    if (cfg.encoding == CharSet.Utf8) encoded
    else encoded.copy(text = Encoding(encoded.text, cfg.encoding))
  }

  /** [[dispatch]] with the poison-document guarantee applied: any per-row
    * failure maps to a status, never an escaping throw. This is BOTH the
    * top-level entry's catch AND the per-MEMBER catch inside container loops
    * (zip/tar/7z/rar/WARC): a corrupt gzip member must be skipped with a
    * `" <- "` frame like any other failing member, not fail the whole
    * container row by throwing through the member loop.
    */
  private[core] def dispatchSafe(bytes: Array[Byte], cfg: ExtractorConfig, ocr: Ocr, depth: Int): ExtractResult =
    try dispatch(bytes, cfg, ocr, depth)
    catch {
      case e: StackOverflowError =>
        ExtractResult.fail(ExtractStatus.ExtractionFailed, "extraction failed: deep recursion")
      case e: OutOfMemoryError =>
        ExtractResult.fail(ExtractStatus.OutOfMemory, "out of memory")
      // fatal deployment/control conditions must NOT become per-row -4:
      // a missing class would otherwise fail 100% of rows "successfully",
      // and a task-kill interrupt would be swallowed mid-cancellation
      case e: InterruptedException => throw e
      case e: LinkageError         => throw e
      case e: VirtualMachineError  => throw e
      case e: Throwable =>
        ExtractResult.fail(ExtractStatus.ExtractionFailed, trim(s"extraction failed: ${e.getMessage}"))
    }

  private def trim(s: String): String = if (s == null) "" else if (s.length > 500) s.substring(0, 500) else s

  private def dispatch(bytes: Array[Byte], cfg: ExtractorConfig, ocr: Ocr): ExtractResult =
    dispatch(bytes, cfg, ocr, depth = 0)

  private[core] def dispatch(bytes: Array[Byte], cfg: ExtractorConfig, ocr: Ocr, depth: Int): ExtractResult = {
    // Empty/null fast path: empty text, non-null metadata, status OK
    // (/root/reference/extractor.go:457-459, integration_test.go:317-339).
    if (bytes == null || bytes.isEmpty)
      return ExtractResult.ok("", if (cfg.xmlOutput) "<doc>\n</doc>" else "",
        Map("Content-Type" -> Seq(MimeSniffer.Empty)), MimeSniffer.Empty)

    MimeSniffer.sniff(bytes) match {
      case MimeSniffer.Html => HtmlExtractor.extract(bytes, cfg)
      case MimeSniffer.Xml => xmlDoc(bytes, cfg)
      case MimeSniffer.Rtf => extractous.rtf.RtfExtractor.extract(bytes, cfg)
      case MimeSniffer.Eml => extractous.mail.MailExtractor.extract(bytes, cfg)
      case MimeSniffer.Ics | MimeSniffer.Vcf =>
        extractous.mail.CalendarExtractor.extract(bytes, cfg)
      case MimeSniffer.Mbox => extractous.mail.MboxExtractor.extract(bytes, cfg)
      case MimeSniffer.Csv => extractous.mail.CsvExtractor.extract(bytes, cfg)
      case MimeSniffer.Markdown => extractous.mail.MarkdownExtractor.extract(bytes, cfg)
      case MimeSniffer.Epub => extractous.epub.EpubExtractor.extract(bytes, cfg)
      case MimeSniffer.Gzip =>
        // gzip-wrapped payload (common in crawls): inflate (bounded, bomb-safe)
        // and re-dispatch on the inner bytes; depth-capped
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "gzip nesting too deep", MimeSniffer.Gzip)
        else {
          val inner = gunzip(bytes, maxOut = 256 * 1024 * 1024)
          val r = dispatch(inner, cfg, ocr, depth + 1)
          // debug chain (reference errors.go:301-316): failures inside a
          // wrapped payload carry their decoding context as a " <- " frame
          val chained =
            if (r.status != ExtractStatus.Ok && r.error.nonEmpty)
              r.copy(error = s"${r.error} <- gzip layer ${depth + 1}")
            else r
          chained.copy(metadata = chained.metadata + ("Content-Encoding" -> Seq("gzip")))
        }
      case MimeSniffer.Xz =>
        // xz-wrapped payload (.xz/.tar.xz): decode through the LZMA2 path
        // and re-dispatch on the inner bytes; shares the wrapper depth cap
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "xz nesting too deep", MimeSniffer.Xz)
        else
          try {
            val inner = Xz.decode(bytes)
            val r = dispatch(inner, cfg, ocr, depth + 1)
            val chained =
              if (r.status != ExtractStatus.Ok && r.error.nonEmpty)
                r.copy(error = s"${r.error} <- xz layer ${depth + 1}")
              else r
            chained.copy(metadata = chained.metadata + ("Content-Encoding" -> Seq("xz")))
          } catch {
            // out-of-scope filter chains refuse with -8 (honest), while
            // structural damage falls through to the top-level -4 mapping
            case e: UnsupportedArchiveException =>
              ExtractResult.fail(ExtractStatus.UnsupportedFormat, trim(e.getMessage), MimeSniffer.Xz)
          }
      case MimeSniffer.Bzip2 =>
        // bzip2-wrapped payload (.bz2/.tar.bz2): decode and re-dispatch on
        // the inner bytes; shares the wrapper depth cap
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "bzip2 nesting too deep", MimeSniffer.Bzip2)
        else
          try {
            val inner = Bzip2.decode(bytes)
            val r = dispatch(inner, cfg, ocr, depth + 1)
            val chained =
              if (r.status != ExtractStatus.Ok && r.error.nonEmpty)
                r.copy(error = s"${r.error} <- bzip2 layer ${depth + 1}")
              else r
            chained.copy(metadata = chained.metadata + ("Content-Encoding" -> Seq("bzip2")))
          } catch {
            // deprecated randomized blocks refuse with -8 (honest), while
            // structural damage falls through to the top-level -4 mapping
            case e: UnsupportedArchiveException =>
              ExtractResult.fail(ExtractStatus.UnsupportedFormat, trim(e.getMessage), MimeSniffer.Bzip2)
          }
      case MimeSniffer.Zstd =>
        // zstd-wrapped payload (.zst/.tar.zst, RFC 8878): decode and
        // re-dispatch on the inner bytes; shares the wrapper depth cap
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "zstd nesting too deep", MimeSniffer.Zstd)
        else
          try {
            val inner = Zstd.decode(bytes)
            val r = dispatch(inner, cfg, ocr, depth + 1)
            val chained =
              if (r.status != ExtractStatus.Ok && r.error.nonEmpty)
                r.copy(error = s"${r.error} <- zstd layer ${depth + 1}")
              else r
            chained.copy(metadata = chained.metadata + ("Content-Encoding" -> Seq("zstd")))
          } catch {
            // valid-but-out-of-scope frames (dictionaries) refuse with -8
            // (honest), while structural damage falls through to -4
            case e: UnsupportedArchiveException =>
              ExtractResult.fail(ExtractStatus.UnsupportedFormat, trim(e.getMessage), MimeSniffer.Zstd)
          }
      case MimeSniffer.Lz4 =>
        // lz4-wrapped payload (.lz4/.tar.lz4 frame or legacy format): decode
        // and re-dispatch on the inner bytes; shares the wrapper depth cap
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "lz4 nesting too deep", MimeSniffer.Lz4)
        else
          try {
            val inner = Lz4.decode(bytes)
            val r = dispatch(inner, cfg, ocr, depth + 1)
            val chained =
              if (r.status != ExtractStatus.Ok && r.error.nonEmpty)
                r.copy(error = s"${r.error} <- lz4 layer ${depth + 1}")
              else r
            chained.copy(metadata = chained.metadata + ("Content-Encoding" -> Seq("lz4")))
          } catch {
            // valid-but-out-of-scope frames (dictionary IDs) refuse with -8
            // (honest), while structural damage falls through to -4
            case e: UnsupportedArchiveException =>
              ExtractResult.fail(ExtractStatus.UnsupportedFormat, trim(e.getMessage), MimeSniffer.Lz4)
          }
      case MimeSniffer.Snappy =>
        // framed-snappy payload (.sz): decode and re-dispatch on the inner
        // bytes; shares the wrapper depth cap
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "snappy nesting too deep", MimeSniffer.Snappy)
        else
          try {
            val inner = Snappy.decodeFramed(bytes)
            val r = dispatch(inner, cfg, ocr, depth + 1)
            val chained =
              if (r.status != ExtractStatus.Ok && r.error.nonEmpty)
                r.copy(error = s"${r.error} <- snappy layer ${depth + 1}")
              else r
            chained.copy(metadata = chained.metadata + ("Content-Encoding" -> Seq("snappy")))
          } catch {
            // unskippable reserved chunks refuse with -8 (honest), while
            // structural damage falls through to -4
            case e: UnsupportedArchiveException =>
              ExtractResult.fail(ExtractStatus.UnsupportedFormat, trim(e.getMessage), MimeSniffer.Snappy)
          }
      case MimeSniffer.Plain => plain(bytes, cfg)
      case MimeSniffer.Pdf => PdfExtractor.extract(bytes, cfg, ocr)
      case m @ (MimeSniffer.Docx | MimeSniffer.Xlsx | MimeSniffer.Pptx |
                MimeSniffer.Odt | MimeSniffer.Ods | MimeSniffer.Odp) =>
        OfficeExtractor.extract(bytes, m, cfg)
      case MimeSniffer.Zip => ArchiveExtractor.zip(bytes, cfg, ocr, depth)
      case MimeSniffer.Tar => ArchiveExtractor.tar(bytes, cfg, ocr, depth)
      case MimeSniffer.SevenZ => ArchiveExtractor.sevenZ(bytes, cfg, ocr, depth)
      case MimeSniffer.Rar => ArchiveExtractor.rar(bytes, cfg, ocr, depth)
      case MimeSniffer.Warc => WarcExtractor.extract(bytes, cfg, ocr, depth)
      case MimeSniffer.Iwork => extractous.iwork.IworkExtractor.extract(bytes, cfg)
      case MimeSniffer.Cfb => extractous.office.CfbExtractor.extract(bytes, cfg)
      case m @ (MimeSniffer.Bmp | MimeSniffer.Png | MimeSniffer.Jpeg |
                MimeSniffer.Gif | MimeSniffer.Tiff) => image(bytes, m, cfg, ocr)
      case _ =>
        // Distinguish text-like payloads with broken encoding from plain
        // binary (the charset-detection rungs — UTF-16 BOMs, windows-1252 —
        // live in MimeSniffer and route to Plain before this fallthrough):
        // mostly-printable ⇒ invalid-UTF-8 (-2), else unsupported (-8).
        val printable = bytes.count { b0 =>
          val b = b0 & 0xff
          (b >= 0x20 && b < 0x7f) || b == '\n' || b == '\r' || b == '\t' || b >= 0x80
        }
        if (printable.toDouble / bytes.length >= 0.9)
          ExtractResult.fail(ExtractStatus.InvalidUtf8, "invalid UTF-8 in text payload", MimeSniffer.Plain)
        else
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "unsupported format: application/octet-stream")
    }
  }

  /** Stream analogue of the reference's ExtractBytesToStream + chunked Read
    * loop (/root/reference/extractor.go ExtractBytesToStream, stream.go Read):
    * the extraction result's UTF-8 bytes exposed as bounded chunks through a
    * real InputStream — partial reads allowed, EOF = -1, every chunk at most
    * `chunkSize` bytes. Bounded memory per consumer step regardless of
    * document size.
    */
  def stream(result: ExtractResult, chunkSize: Int): Iterator[Array[Byte]] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val in = new java.io.ByteArrayInputStream(result.text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Iterator.continually {
      val buf = new Array[Byte](chunkSize)
      val n = in.read(buf) // -1 at EOF — the chunk-read contract
      if (n < 0) null else java.util.Arrays.copyOf(buf, n)
    }.takeWhile(_ != null)
  }

  /** Bounded gunzip — a decompression bomb hits the cap and fails the row,
    * never the executor.
    */
  private[extractous] def gunzip(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    // Long math: bytes.length * 4 overflows Int at >= 512 MB inputs (crawl
    // .warc.gz files are that big) and a negative initial size throws
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length.toLong * 4, 1L << 20).toInt)
    val buf = new Array[Byte](65536)
    var total = 0
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > maxOut) throw new IllegalStateException(s"gzip output exceeds $maxOut bytes")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  /** Plain text: charset-aware decode (UTF-16 BOMs, UTF-8 default) +
    * canonical normalization.
    */
  private def plain(bytes: Array[Byte], cfg: ExtractorConfig): ExtractResult = {
    val (decoded, charset) =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
        (new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16LE), "UTF-16LE")
      else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
        (new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE), "UTF-16BE")
      else if (MimeSniffer.isValidUtf8(bytes)) {
        var s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        if (s.nonEmpty && s.charAt(0) == '﻿') s = s.substring(1) // BOM
        (s, "UTF-8")
      } else if (MimeSniffer.looksLikeShiftJis(bytes))
        // CJK rungs: byte-distribution detection (must run BEFORE the cp1252
        // catch-all, which would accept almost any byte). SJIS before GBK —
        // see looksLikeGbk for why the order disambiguates. Unlabeled
        // ISO-8859-1 deliberately lands on the windows-1252 rung below —
        // cp1252 is a superset of latin-1 on every printable byte, which is
        // why real detectors (ICU/Tika) label western 8-bit text cp1252.
        (new String(bytes, java.nio.charset.Charset.forName("Shift_JIS")), "Shift_JIS")
      else MimeSniffer.cyrillicCharset(bytes) match {
        // Russian-web rungs: cp1251 vs KOI8-R by case-band majority — both
        // would "decode" on the cp1252 rung below, as mojibake. This rung
        // runs BEFORE GBK: short-word Cyrillic whose high-byte runs all have
        // even length forms valid GBK lead/trail pairs (and would misroute
        // to GBK mojibake), while the Cyrillic gate — every high byte in the
        // letter zone, ≥8 of them, clustered runs — rejects real GBK text,
        // whose lead bytes routinely fall in 0x81–0xBF outside the zone
        // (Round3FormatsSpec asserts both directions). The match binds the
        // Option once — the detector is a full byte scan per call.
        case Some(cs) => (new String(bytes, java.nio.charset.Charset.forName(cs)), cs)
        case None =>
          if (MimeSniffer.looksLikeGbk(bytes))
            (new String(bytes, java.nio.charset.Charset.forName("GBK")), "GBK")
          else
            (new String(bytes, java.nio.charset.Charset.forName("windows-1252")), "windows-1252")
      }
    plainDecoded(decoded, charset, cfg)
  }

  private def plainDecoded(s: String, charset: String, cfg: ExtractorConfig): ExtractResult = {
    val emitter = new TextEmitter(cfg.maxStringLength)
    val xe = new XmlEmitter(cfg.maxStringLength, cfg.xmlOutput)
    s.split("\n", -1).iterator.takeWhile(_ => !emitter.isFull).foreach { line =>
      emitter.addBlock(line)
      if (cfg.xmlOutput) xe.addElement("p", line)
    }
    ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "",
      Map("Content-Type" -> Seq(s"text/plain; charset=$charset")), MimeSniffer.Plain)
  }

  /** Generic XML document: every element is a block boundary, character data
    * becomes blocks in document order (Tika-style XML-to-text semantics).
    */
  private def xmlDoc(bytes: Array[Byte], cfg: ExtractorConfig): ExtractResult = {
    val root = extractous.html.HtmlDom.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val emitter = new TextEmitter(cfg.maxStringLength)
    val xe = new XmlEmitter(cfg.maxStringLength, cfg.xmlOutput)
    def walk(n: extractous.html.HNode): Unit = n match {
      case extractous.html.HText(t) =>
        if (!emitter.isFull && Normalize.line(t).nonEmpty) { emitter.addBlock(t); xe.addElement("p", t) }
      case e: extractous.html.HElem => e.children.foreach(walk)
    }
    walk(root)
    ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "",
      Map("Content-Type" -> Seq(MimeSniffer.Xml)), MimeSniffer.Xml)
  }

  /** Standalone scanned image → OCR. OCR failures map to status -10 and never
    * propagate (/root/reference/config.go:687).
    */
  private def image(bytes: Array[Byte], mime: String, cfg: ExtractorConfig, ocr: Ocr): ExtractResult = {
    try {
      val text = ocr.recognize(bytes, cfg.ocr)
      val emitter = new TextEmitter(cfg.maxStringLength)
      val xe = new XmlEmitter(cfg.maxStringLength, cfg.xmlOutput)
      text.split("\n", -1).iterator.takeWhile(_ => !emitter.isFull).foreach { line =>
        emitter.addBlock(line)
        if (cfg.xmlOutput) xe.addElement("p", line)
      }
      // record the effective OCR parameters (Tika-style parser provenance) —
      // the config knobs are observable downstream per document
      val meta = Map(
        "Content-Type" -> Seq(mime),
        "X-OCR-Language" -> Seq(cfg.ocr.language),
        "X-OCR-Density" -> Seq(cfg.ocr.density.toString),
        "X-OCR-Depth" -> Seq(cfg.ocr.depth.toString),
        "X-OCR-Preprocessing" -> Seq(cfg.ocr.enableImagePreprocessing.toString))
      ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "", meta, mime)
    } catch {
      case e: Exception =>
        ExtractResult.fail(ExtractStatus.OcrFailed, trim(s"OCR failed: ${e.getMessage}"), mime)
    }
  }
}
