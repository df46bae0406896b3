package extractous.config

/** Immutable configuration value objects. The reference uses consuming
  * builder-pattern handles (/root/reference/config.go:58-60, extractor.go:48-62);
  * here configuration is plain immutable data, broadcast-safe and serializable —
  * a pure function `Extract(bytes, cfg)` replaces the mutable Extractor handle.
  *
  * All defaults mirror the reference:
  *  - extractor defaults /root/reference/extractor.go:117-124 (UTF-8, 100 MB max
  *    string, XML off, OCR off)
  *  - PDF defaults /root/reference/config.go:17-25
  *  - Office defaults /root/reference/config.go:244-251
  *  - OCR defaults /root/reference/config.go:438-446
  */
sealed abstract class CharSet(val id: Int, val charsetName: String)
object CharSet {
  /** One consistent enum: the reference's Go/FFI disagree on UTF-16BE's value
    * (2 vs 3 — /root/reference/types.go:90 vs ffi/src/types.rs:36), making the
    * setting a silent no-op from Go. We do not reproduce that bug.
    */
  case object Utf8 extends CharSet(0, "UTF-8")
  case object UsAscii extends CharSet(1, "US-ASCII")
  case object Utf16Be extends CharSet(2, "UTF-16BE")
  val all: Seq[CharSet] = Seq(Utf8, UsAscii, Utf16Be)
}

/** PDF OCR strategy (/root/reference/types.go:177-276). */
sealed abstract class PdfOcrStrategy(val id: Int)
object PdfOcrStrategy {
  case object NoOcr extends PdfOcrStrategy(0)
  case object OcrOnly extends PdfOcrStrategy(1)
  case object OcrAndText extends PdfOcrStrategy(2)
  /** Auto = per-page predicate: pages with embedded text use the text path,
    * image-only pages go through OCR (/root/reference/types.go:251-275). */
  case object Auto extends PdfOcrStrategy(3)
}

final case class PdfConfig(
    ocrStrategy: PdfOcrStrategy = PdfOcrStrategy.NoOcr,
    extractInlineImages: Boolean = false,
    extractUniqueInlineImagesOnly: Boolean = true,
    extractMarkedContent: Boolean = false,
    extractAnnotationText: Boolean = true,
    /** Credential for password-protected standard-security documents: tried
      * as the USER password, then as the OWNER password (PDF 32000-1
      * Algorithms 7 / 12). Empty = only the openable-by-anyone stratum
      * (empty user password) decrypts; wrong passwords refuse with a typed
      * status, never garbage. Beyond the reference (it has no password
      * surface — /root/reference/errors.go:98 just classifies the failure).
      */
    password: String = "")

final case class OfficeConfig(
    extractMacros: Boolean = true,
    includeDeletedContent: Boolean = false,
    includeMoveFromContent: Boolean = false,
    includeShapeBasedContent: Boolean = true)

final case class OcrConfig(
    language: String = "eng",
    density: Int = 300,
    depth: Int = 32,
    enableImagePreprocessing: Boolean = false,
    timeoutSeconds: Int = 300)

/** HTML body-text mode. `MainContent` (boilerplate stripped via text/link-density
  * heuristics) is this engine's flagship per the north rule; `AllText` matches the
  * reference's Tika-style extract-everything behavior.
  */
sealed trait HtmlMode
object HtmlMode {
  case object MainContent extends HtmlMode
  case object AllText extends HtmlMode
}

final case class ExtractorConfig(
    maxStringLength: Int = 100_000_000,
    encoding: CharSet = CharSet.Utf8,
    xmlOutput: Boolean = false,
    htmlMode: HtmlMode = HtmlMode.MainContent,
    pdf: PdfConfig = PdfConfig(),
    office: OfficeConfig = OfficeConfig(),
    ocr: OcrConfig = OcrConfig())

object ExtractorConfig {
  val default: ExtractorConfig = ExtractorConfig()
}
