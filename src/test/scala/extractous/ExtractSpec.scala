package extractous

import extractous.config._
import extractous.core.Extract
import extractous.model.ExtractStatus
import org.scalatest.funsuite.AnyFunSuite

class ExtractSpec extends AnyFunSuite {
  test("empty input: empty text, non-null metadata, status 0 (ref integration_test.go:317-339)") {
    val r = Extract(Array.emptyByteArray)
    assert(r.text == "" && r.status == 0)
    assert(r.metadata.contains("Content-Type"))
  }
  test("null input same as empty") {
    val r = Extract(null)
    assert(r.text == "" && r.status == 0)
  }
  test("plain utf8 cjk roundtrip (ref integration_test.go:160-179)") {
    val s = "こんにちは、世界！ This is UTF-8: héllo wörld"
    val r = Extract(s.getBytes("UTF-8"))
    assert(r.text == s)
    assert(r.metadata("Content-Type").head.contains("text/plain"))
  }
  test("bom stripped from plain text") {
    val r = Extract(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "hello".getBytes("UTF-8"))
    assert(r.text == "hello")
  }
  test("max length truncation (ref integration_test.go:136-158)") {
    val body = "word " * 2000
    val r = Extract(body.getBytes("UTF-8"), ExtractorConfig(maxStringLength = 100))
    assert(r.text.length <= 100)
    assert(r.text.nonEmpty)
  }
  test("us-ascii encoding folds") {
    val r = Extract("héllo".getBytes("UTF-8"), ExtractorConfig(encoding = CharSet.UsAscii))
    assert(r.text == "h?llo")
  }
  test("jpeg unsupported -8") {
    val r = Extract(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3))
    assert(r.status == ExtractStatus.UnsupportedFormat)
  }
  test("mostly-printable invalid utf8 -2") {
    val r = Extract(("looks like text " * 4).getBytes("US-ASCII") ++ Array[Byte](0xff.toByte))
    assert(r.status == ExtractStatus.InvalidUtf8)
  }
  test("binary garbage -8") {
    val r = Extract(Array.tabulate[Byte](256)(i => i.toByte))
    assert(r.status == ExtractStatus.UnsupportedFormat)
  }
  test("status message map covers the 11 reference codes") {
    assert(ExtractStatus.message.size == 11)
    assert(ExtractStatus.message(ExtractStatus.OcrFailed) == "OCR failed")
  }
  test("generic xml document extracts character data in order") {
    val xml = """<?xml version="1.0"?><catalog><item><name>Widget</name><price>9 dollars</price></item><item><name>Gadget</name></item></catalog>"""
    val r = Extract(xml.getBytes("UTF-8"))
    assert(r.contentType == "application/xml")
    assert(r.text == "Widget\n9 dollars\nGadget")
  }

  test("xml output mode flips per config (ref integration_test.go:181-218)") {
    val html = "<html><body><article><p>structured mode check with sufficient words in it</p></article></body></html>".getBytes("UTF-8")
    val plainR = Extract(html)
    val xmlR = Extract(html, ExtractorConfig(xmlOutput = true))
    assert(plainR.xml == "")
    assert(xmlR.xml.startsWith("<doc>") && xmlR.xml.contains("<p>"))
  }
}
