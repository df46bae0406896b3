package extractous.core

import java.nio.charset.StandardCharsets.UTF_8

/** WET — Common Crawl's text sidecar format: a WARC (ISO 28500) file whose
  * payload records are `conversion` records carrying the extracted
  * `text/plain` of each page, one gzip member per record. Crawl consumers
  * that don't want to re-run extraction read the `*.warc.wet.gz` sidecars
  * instead of the raw `*.warc.gz`; emitting them closes this engine's
  * crawl-ecosystem loop (ingest WARC → extract → emit WET), the conversion
  * the Tika-backed reference leaves to its callers (the reference emits
  * plain strings per file, /root/reference/extractor.go:452-481 — it has no
  * container *writer* at all).
  *
  * Everything here is deterministic — record ids are name-based (md5 over
  * url + date laid out as a UUID), never random — so the same corpus always
  * yields byte-identical WET output, the engine-reproducibility contract
  * every other writer in this repo follows, and the property that lets a
  * closed-form SQL oracle (`x_wet`) replay the full framing. Re-ingesting a
  * WET file through [[WarcExtractor]] yields the extracted text back
  * (conversion records dispatch directly), which `x_wet_ingest` and WetSpec
  * verify end-to-end.
  */
object Wet {

  /** Name-based record id: md5(url \n date) in UUID 8-4-4-4-12 layout.
    * Deterministic by design (crawlers mint random uuids; reproducible
    * output demands content-derived ones) and replayable in SQL as
    * `md5(url || chr(10) || date)`.
    */
  def recordId(url: String, dateIso: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((url + "\n" + dateIso).getBytes(UTF_8))
    val hex = new StringBuilder(32)
    var i = 0
    while (i < d.length) { hex.append(f"${d(i) & 0xff}%02x"); i += 1 }
    val h = hex.toString
    s"urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}"
  }

  /** Header block for one conversion record. `textBytes` is the UTF-8 byte
    * count of the payload (WARC Content-Length counts octets, not chars).
    */
  def recordHeader(url: String, dateIso: String, textBytes: Long): String =
    "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Record-ID: <${recordId(url, dateIso)}>\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: $textBytes\r\n" +
      "\r\n"

  /** One framed conversion record INCLUDING the trailing CRLF CRLF block
    * separator, as a string (the `x_wet` query emits this form; the byte
    * form below reuses it, so there is exactly ONE framing implementation).
    */
  def recordString(url: String, dateIso: String, text: String): String =
    recordHeader(url, dateIso, utf8Len(text)) + text + "\r\n\r\n"

  def recordBytes(url: String, dateIso: String, text: String): Array[Byte] =
    recordString(url, dateIso, text).getBytes(UTF_8)

  /** Leading `warcinfo` record each WET file opens with: tool provenance as
    * `application/warc-fields`, the same version string every extraction row
    * carries (`extractor_version`, reference behavior #45).
    */
  def warcinfo(filename: String, dateIso: String): Array[Byte] = {
    val body = s"software: ${extractous.model.ExtractResult.Version}\r\n" +
      "format: WARC File Format 1.0\r\n" +
      "conversion: text/plain\r\n"
    val bodyBytes = body.getBytes(UTF_8)
    val head = "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Filename: $filename\r\n" +
      s"WARC-Record-ID: <${recordId(filename, dateIso)}>\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${bodyBytes.length}\r\n" +
      "\r\n"
    val out = new java.io.ByteArrayOutputStream(head.length + bodyBytes.length + 4)
    out.write(head.getBytes(UTF_8))
    out.write(bodyBytes)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** One gzip member per record — the Common Crawl `.warc.wet.gz` shape
    * (members concatenate; [[Extract.gunzip]] inflates all members on
    * re-ingest, so round-trip needs no new reader code).
    */
  def gzMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record)
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  /** UTF-8 byte length without materializing the byte array (counts by
    * codepoint class — 1/2/3/4 octets).
    */
  def utf8Len(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      i += Character.charCount(cp)
    }
    n
  }
}
