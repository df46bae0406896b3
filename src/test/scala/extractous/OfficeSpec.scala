package extractous

import extractous.config.{ExtractorConfig, OfficeConfig}
import extractous.gen.DocxWriter
import extractous.model.ExtractStatus
import extractous.office.OfficeExtractor
import extractous.sniff.MimeSniffer
import org.scalatest.funsuite.AnyFunSuite

class OfficeSpec extends AnyFunSuite {
  private val cfg = ExtractorConfig()
  private val docxBytes = DocxWriter.docx(Seq("Heading", "Body text"), "TheTitle", "GONE", "MOVED", "BOXED")

  test("docx default: deletions and move-from excluded, shapes included") {
    val r = OfficeExtractor.extract(docxBytes, MimeSniffer.Docx, cfg)
    assert(r.status == 0)
    assert(r.text == "Heading\nBody text\nBOXED")
    assert(r.metadata("dc:title") == Seq("TheTitle"))
  }
  test("docx includeDeletedContent") {
    val c = cfg.copy(office = OfficeConfig(includeDeletedContent = true))
    val r = OfficeExtractor.extract(docxBytes, MimeSniffer.Docx, c)
    assert(r.text == "Heading\nBody text\nGONE\nBOXED")
  }
  test("docx includeMoveFromContent") {
    val c = cfg.copy(office = OfficeConfig(includeMoveFromContent = true))
    val r = OfficeExtractor.extract(docxBytes, MimeSniffer.Docx, c)
    assert(r.text == "Heading\nBody text\nMOVED\nBOXED")
  }
  test("docx excludeShapeBasedContent") {
    val c = cfg.copy(office = OfficeConfig(includeShapeBasedContent = false))
    val r = OfficeExtractor.extract(docxBytes, MimeSniffer.Docx, c)
    assert(r.text == "Heading\nBody text")
  }
  test("config order independence (flags are plain data)") {
    val a = OfficeConfig(includeDeletedContent = true, includeMoveFromContent = true)
    val b = OfficeConfig(includeMoveFromContent = true, includeDeletedContent = true)
    assert(OfficeExtractor.extract(docxBytes, MimeSniffer.Docx, cfg.copy(office = a)).text ==
      OfficeExtractor.extract(docxBytes, MimeSniffer.Docx, cfg.copy(office = b)).text)
  }
  test("docx xml escaping roundtrip") {
    val d = DocxWriter.docx(Seq("a < b & c"), "t", "d", "m", "s")
    val r = OfficeExtractor.extract(d, MimeSniffer.Docx, cfg)
    assert(r.text.startsWith("a < b & c"))
  }
  test("corrupt zip yields -4") {
    val bad = Array[Byte]('P', 'K', 3, 4) ++ Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val r = OfficeExtractor.extract(bad, MimeSniffer.Zip, cfg)
    assert(r.status == ExtractStatus.ExtractionFailed)
  }
  test("xlsx shared strings and inline values") {
    val shared = """<?xml version="1.0"?><sst xmlns="x"><si><t>alpha</t></si><si><t>beta</t></si></sst>"""
    val sheet = """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>
      <row><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
      <row><c r="A2" t="s"><v>1</v></c></row>
      </sheetData></worksheet>"""
    val zipb = DocxWriter.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
      "xl/sharedStrings.xml" -> shared.getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes("UTF-8")))
    val r = OfficeExtractor.extract(zipb, MimeSniffer.Xlsx, cfg)
    assert(r.text == "alpha 42\nbeta")
  }
  test("xlsx sheets in numeric order (sheet10 after sheet2, not lexicographic)") {
    def sheet(v: String) =
      s"""<?xml version="1.0"?><worksheet xmlns="x"><sheetData><row><c r="A1"><v>$v</v></c></row></sheetData></worksheet>"""
    val zipb = DocxWriter.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
      "xl/worksheets/sheet10.xml" -> sheet("ten").getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" -> sheet("one").getBytes("UTF-8"),
      "xl/worksheets/sheet2.xml" -> sheet("two").getBytes("UTF-8")))
    val r = OfficeExtractor.extract(zipb, MimeSniffer.Xlsx, cfg)
    assert(r.text == "one\ntwo\nten")
  }
  test("pptx slide text in order") {
    def slide(ts: String*) =
      s"""<?xml version="1.0"?><p:sld xmlns:p="p" xmlns:a="a"><p:txBody>${ts.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString}</p:txBody></p:sld>"""
    val zipb = DocxWriter.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
      "ppt/slides/slide1.xml" -> slide("one", "two").getBytes("UTF-8"),
      "ppt/slides/slide2.xml" -> slide("three").getBytes("UTF-8"),
      "ppt/slides/slide10.xml" -> slide("ten").getBytes("UTF-8")))
    val r = OfficeExtractor.extract(zipb, MimeSniffer.Pptx, cfg)
    assert(r.text == "one\ntwo\nthree\nten") // numeric slide ordering, not lexicographic
  }
}
