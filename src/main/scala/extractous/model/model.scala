package extractous.model

import java.sql.Timestamp

/** Canonical input row: one Common-Crawl-style page (BASELINE.json `input_hint`).
  * `html` is the raw payload bytes — despite the name it may hold any supported
  * format (HTML, PDF, DOCX, scanned image, plain text), mirroring the reference's
  * bytes-in entry point (/root/reference/extractor.go:452).
  */
final case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Canonical output row, keyed by `url`.
  * `metadata` is a true multi-map — the reference's lossy join-on-", "/re-split
  * round trip (/root/reference/ffi/src/metadata.rs:28, metadata.go:136-142) is
  * deliberately NOT reproduced.
  */
final case class ExtractedDoc(
    url: String,
    text: String,
    xml: String,
    metadata: Map[String, Seq[String]],
    status: Int,
    error: String,
    content_type: String,
    extractor_version: String)

/** Per-partition lineage row (north rule: partition id, input files, doc count,
  * bytes, extractor version).
  */
final case class Lineage(
    partition_id: Int,
    input_files: Seq[String],
    doc_count: Long,
    bytes: Long,
    extractor_version: String)

/** Status code space mirrors the reference FFI exactly
  * (/root/reference/ffi/src/errors.rs:8-18). Unlike the reference, which
  * classifies by sniffing error-message strings
  * (/root/reference/ffi/src/errors.rs:20-58), every failure site in this engine
  * assigns its code directly.
  */
object ExtractStatus {
  val Ok: Int = 0
  val NullPointer: Int = -1
  val InvalidUtf8: Int = -2
  val InvalidString: Int = -3
  val ExtractionFailed: Int = -4
  val IoError: Int = -5
  val InvalidConfig: Int = -6
  val InvalidEnum: Int = -7
  val UnsupportedFormat: Int = -8
  val OutOfMemory: Int = -9
  val OcrFailed: Int = -10

  /** Static code→message map mirroring the 11 strings of
    * /root/reference/ffi/src/errors.rs:61-80 (semantics, not verbatim text).
    */
  val message: Map[Int, String] = Map(
    Ok -> "success",
    NullPointer -> "null pointer argument",
    InvalidUtf8 -> "invalid UTF-8",
    InvalidString -> "invalid string",
    ExtractionFailed -> "extraction failed",
    IoError -> "I/O error",
    InvalidConfig -> "invalid configuration",
    InvalidEnum -> "invalid enum value",
    UnsupportedFormat -> "unsupported format",
    OutOfMemory -> "out of memory",
    OcrFailed -> "OCR failed")
}

/** In-memory result of one extraction (pre-Spark-row). */
final case class ExtractResult(
    text: String,
    xml: String,
    metadata: Map[String, Seq[String]],
    status: Int,
    error: String,
    contentType: String)

object ExtractResult {
  val Version = "extractous-spark/0.1.0"
  def ok(text: String, xml: String, metadata: Map[String, Seq[String]], contentType: String): ExtractResult =
    ExtractResult(text, xml, metadata, ExtractStatus.Ok, "", contentType)
  def fail(status: Int, error: String, contentType: String = "application/octet-stream"): ExtractResult =
    ExtractResult("", "", Map("Content-Type" -> Seq(contentType)), status, error, contentType)
}
