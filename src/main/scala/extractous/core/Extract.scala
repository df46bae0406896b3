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
    val encoded =
      try dispatch(bytes, cfg, ocr)
      catch {
        case e: StackOverflowError =>
          ExtractResult.fail(ExtractStatus.ExtractionFailed, "extraction failed: deep recursion")
        case e: OutOfMemoryError =>
          ExtractResult.fail(ExtractStatus.OutOfMemory, "out of memory")
        case e: Throwable =>
          ExtractResult.fail(ExtractStatus.ExtractionFailed, trim(s"extraction failed: ${e.getMessage}"))
      }
    if (cfg.encoding == CharSet.Utf8) encoded
    else encoded.copy(text = Encoding(encoded.text, cfg.encoding))
  }

  private def trim(s: String): String = if (s == null) "" else if (s.length > 500) s.substring(0, 500) else s

  private def dispatch(bytes: Array[Byte], cfg: ExtractorConfig, ocr: Ocr): ExtractResult =
    dispatch(bytes, cfg, ocr, depth = 0)

  private def dispatch(bytes: Array[Byte], cfg: ExtractorConfig, ocr: Ocr, depth: Int): ExtractResult = {
    // Empty/null fast path: empty text, non-null metadata, status OK
    // (/root/reference/extractor.go:457-459, integration_test.go:317-339).
    if (bytes == null || bytes.isEmpty)
      return ExtractResult.ok("", if (cfg.xmlOutput) "<doc>\n</doc>" else "",
        Map("Content-Type" -> Seq(MimeSniffer.Empty)), MimeSniffer.Empty)

    MimeSniffer.sniff(bytes) match {
      case MimeSniffer.Html => HtmlExtractor.extract(bytes, cfg)
      case MimeSniffer.Xml => xmlDoc(bytes, cfg)
      case MimeSniffer.Rtf => extractous.rtf.RtfExtractor.extract(bytes, cfg)
      case MimeSniffer.Gzip =>
        // gzip-wrapped payload (common in crawls): inflate (bounded, bomb-safe)
        // and re-dispatch on the inner bytes; depth-capped
        if (depth >= 3)
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "gzip nesting too deep", MimeSniffer.Gzip)
        else {
          val inner = gunzip(bytes, maxOut = 256 * 1024 * 1024)
          val r = dispatch(inner, cfg, ocr, depth + 1)
          r.copy(metadata = r.metadata + ("Content-Encoding" -> Seq("gzip")))
        }
      case MimeSniffer.Plain => plain(bytes, cfg)
      case MimeSniffer.Pdf => PdfExtractor.extract(bytes, cfg, ocr)
      case m @ (MimeSniffer.Docx | MimeSniffer.Xlsx | MimeSniffer.Pptx | MimeSniffer.Zip) =>
        OfficeExtractor.extract(bytes, m, cfg)
      case m @ (MimeSniffer.Bmp | MimeSniffer.Png) => image(bytes, m, cfg, ocr)
      case MimeSniffer.Jpeg =>
        ExtractResult.fail(ExtractStatus.UnsupportedFormat, "unsupported format: image/jpeg", MimeSniffer.Jpeg)
      case _ =>
        // Distinguish text-like payloads with broken encoding from plain binary:
        // mostly-printable-ASCII ⇒ invalid-UTF-8 (-2), else unsupported (-8).
        val printable = bytes.count(b => (b >= 0x20 && b < 0x7f) || b == '\n' || b == '\r' || b == '\t')
        if (printable.toDouble / bytes.length >= 0.9)
          ExtractResult.fail(ExtractStatus.InvalidUtf8, "invalid UTF-8 in text payload", MimeSniffer.Plain)
        else
          ExtractResult.fail(ExtractStatus.UnsupportedFormat, "unsupported format: application/octet-stream")
    }
  }

  /** Bounded gunzip — a decompression bomb hits the cap and fails the row,
    * never the executor.
    */
  private def gunzip(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
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

  /** Plain text: UTF-8 decode + canonical normalization. */
  private def plain(bytes: Array[Byte], cfg: ExtractorConfig): ExtractResult = {
    var s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (s.nonEmpty && s.charAt(0) == '﻿') s = s.substring(1) // BOM
    val emitter = new TextEmitter(cfg.maxStringLength)
    val xe = new XmlEmitter(cfg.maxStringLength)
    s.split("\n", -1).iterator.takeWhile(_ => !emitter.isFull).foreach { line =>
      emitter.addBlock(line)
      if (cfg.xmlOutput) xe.addElement("p", line)
    }
    ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "",
      Map("Content-Type" -> Seq("text/plain; charset=UTF-8")), MimeSniffer.Plain)
  }

  /** Generic XML document: every element is a block boundary, character data
    * becomes blocks in document order (Tika-style XML-to-text semantics).
    */
  private def xmlDoc(bytes: Array[Byte], cfg: ExtractorConfig): ExtractResult = {
    val root = extractous.html.HtmlDom.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val emitter = new TextEmitter(cfg.maxStringLength)
    val xe = new XmlEmitter(cfg.maxStringLength)
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
      val xe = new XmlEmitter(cfg.maxStringLength)
      text.split("\n", -1).iterator.takeWhile(_ => !emitter.isFull).foreach { line =>
        emitter.addBlock(line)
        if (cfg.xmlOutput) xe.addElement("p", line)
      }
      ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "",
        Map("Content-Type" -> Seq(mime)), mime)
    } catch {
      case e: Exception =>
        ExtractResult.fail(ExtractStatus.OcrFailed, trim(s"OCR failed: ${e.getMessage}"), mime)
    }
  }
}
