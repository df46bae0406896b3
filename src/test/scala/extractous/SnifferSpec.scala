package extractous

import extractous.sniff.MimeSniffer
import org.scalatest.funsuite.AnyFunSuite

class SnifferSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes("UTF-8")

  test("pdf magic") { assert(MimeSniffer.sniff(b("%PDF-1.7\nrest")) == MimeSniffer.Pdf) }
  test("html doctype") { assert(MimeSniffer.sniff(b("<!DOCTYPE html><html></html>")) == MimeSniffer.Html) }
  test("html bare tag") { assert(MimeSniffer.sniff(b("  <div class=\"x\">hi</div>")) == MimeSniffer.Html) }
  test("html with BOM") { assert(MimeSniffer.sniff(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ b("<html><body>x</body></html>")) == MimeSniffer.Html) }
  test("plain utf8") { assert(MimeSniffer.sniff(b("just words")) == MimeSniffer.Plain) }
  test("plain cjk") { assert(MimeSniffer.sniff(b("こんにちは世界")) == MimeSniffer.Plain) }
  test("empty") { assert(MimeSniffer.sniff(Array.emptyByteArray) == MimeSniffer.Empty) }
  test("bmp") { assert(MimeSniffer.sniff(b("BM") ++ new Array[Byte](60)) == MimeSniffer.Bmp) }
  test("png") { assert(MimeSniffer.sniff(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++ new Array[Byte](16)) == MimeSniffer.Png) }
  test("jpeg") { assert(MimeSniffer.sniff(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)) == MimeSniffer.Jpeg) }
  test("generic zip") { assert(MimeSniffer.sniff(Array[Byte]('P', 'K', 3, 4) ++ new Array[Byte](32)) == MimeSniffer.Zip) }
  test("docx by entry name") {
    val zipb = extractous.gen.DocxWriter.docx(Seq("x"), "t", "d", "m", "s")
    assert(MimeSniffer.sniff(zipb) == MimeSniffer.Docx)
  }
  test("invalid utf8 with cp1252-undefined bytes is octet-stream") {
    assert(MimeSniffer.sniff(b("text then ") ++ Array[Byte](0x81.toByte, 0x8d.toByte)) == MimeSniffer.OctetStream)
  }
  test("clean single-byte non-utf8 text sniffs as plain (cp1252 rung)") {
    assert(MimeSniffer.sniff(b("text then ") ++ Array[Byte](0xff.toByte, 0xfe.toByte)) == MimeSniffer.Plain)
    assert(MimeSniffer.looksLikeCp1252Text("café".getBytes(java.nio.charset.Charset.forName("windows-1252"))))
  }
  test("utf-16 BOM payloads sniff as plain") {
    assert(MimeSniffer.sniff(Array[Byte](0xff.toByte, 0xfe.toByte) ++ "hi".getBytes("UTF-16LE")) == MimeSniffer.Plain)
    assert(MimeSniffer.sniff(Array[Byte](0xfe.toByte, 0xff.toByte) ++ "hi".getBytes("UTF-16BE")) == MimeSniffer.Plain)
  }
  test("odf documents sniff by stored mimetype entry") {
    assert(MimeSniffer.sniff(extractous.gen.OdfWriter.odt("h", Seq("p"), "t")) == MimeSniffer.Odt)
    assert(MimeSniffer.sniff(extractous.gen.OdfWriter.ods(Seq(Seq("a")), "t")) == MimeSniffer.Ods)
    assert(MimeSniffer.sniff(extractous.gen.OdfWriter.odp(Seq("s"), "t")) == MimeSniffer.Odp)
  }
  test("utf8 validator") {
    assert(MimeSniffer.isValidUtf8(b("héllo wörld こんにちは")))
    assert(!MimeSniffer.isValidUtf8(Array[Byte](0xc0.toByte, 0x80.toByte))) // overlong
    assert(!MimeSniffer.isValidUtf8(Array[Byte](0xf5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte)))
    assert(!MimeSniffer.isValidUtf8(b("abc") :+ 0xe3.toByte)) // truncated sequence
  }
}
