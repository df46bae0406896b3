package extractous

import extractous.core.Extract
import extractous.gen.DocWriter
import extractous.model.ExtractStatus
import extractous.office.{Cfb, DocExtractor}
import extractous.config.ExtractorConfig
import org.scalatest.funsuite.AnyFunSuite

class CfbSpec extends AnyFunSuite {
  test("small .doc (mini-stream path) roundtrips") {
    val bytes = DocWriter.doc(Seq("Document 7", "hello legacy world"))
    assert(Cfb.isCfb(bytes))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Document 7\nhello legacy world")
    assert(r.contentType == "application/msword")
  }
  test("large .doc (FAT path, past the 4096-byte mini cutoff) roundtrips") {
    val big = "lorem ipsum dolor sit " * 300 // ~6.6 KB
    val bytes = DocWriter.doc(Seq("Head", big))
    val c = Cfb.parse(bytes)
    assert(c.stream("WordDocument").get.length >= 4096)
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Head\n" + big.trim)
  }
  test("cp1252 text in the .doc body survives") {
    val r = Extract(DocWriter.doc(Seq("café — résumé")))
    assert(r.status == ExtractStatus.Ok && r.text == "café — résumé")
  }
  test("complex (piece-table) docs fail with a status, never wrong text") {
    val bytes = DocWriter.doc(Seq("x"))
    val c = Cfb.parse(bytes)
    val wd = c.stream("WordDocument").get
    // flip fComplex in a copy of the container: find the FIB inside the file
    val idx = (0 until bytes.length - 1).find(i => (bytes(i) & 0xff) == 0xec && (bytes(i + 1) & 0xff) == 0xa5).get
    val mut = bytes.clone()
    mut(idx + 0x0a) = (mut(idx + 0x0a) | 0x04).toByte
    val r = Extract(mut)
    assert(r.status == ExtractStatus.UnsupportedFormat && r.text == "")
    assert(wd.nonEmpty)
  }
  test(".doc with a 16-bit text area fails with a status, never NUL-garbage") {
    // non-complex file whose fcMin..fcMac area is UTF-16LE (unicode pieces):
    // build an 8-bit doc, then rewrite its text area in place as 16-bit —
    // same length, half the characters, every other byte NUL
    val ascii = "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF" // 32 chars
    val bytes = DocWriter.doc(Seq(ascii)).clone()
    val probe = ascii.getBytes("windows-1252")
    val at = (0 until bytes.length - probe.length)
      .find(i => probe.indices.forall(j => bytes(i + j) == probe(j))).get
    val utf16 = ascii.take(16).getBytes("UTF-16LE") // 32 bytes again
    System.arraycopy(utf16, 0, bytes, at, utf16.length)
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.UnsupportedFormat, s"got status ${r.status}: '${r.text}'")
    assert(r.text == "", "must not emit NUL-interleaved garbage text")
  }
  test("CFB without a WordDocument stream is unsupported, not a crash") {
    val bytes = DocWriter.doc(Seq("x")).clone()
    // corrupt the directory name so WordDocument is not found
    val nameIdx = {
      val probe = "WordDocument".getBytes("UTF-16LE")
      (0 until bytes.length - probe.length).find(i => probe.indices.forall(j => bytes(i + j) == probe(j))).get
    }
    bytes(nameIdx) = 'X'.toByte
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.UnsupportedFormat)
  }
  test("truncated CFB fails the row") {
    val bytes = DocWriter.doc(Seq("hello truncation"))
    val r = Extract(bytes.take(700))
    assert(r.status == ExtractStatus.ExtractionFailed)
  }
}
