package extractous

import extractous.core.Extract
import extractous.gen.PagesWriter
import extractous.model.ExtractStatus
import extractous.sniff.MimeSniffer
import org.scalatest.funsuite.AnyFunSuite

/** iWork Pages '09: package sniff (index.xml + QuickLook/), sf:p walk in
  * document order, entity round-trip, and rejection of non-Pages / IWA
  * shapes with a status.
  */
class IworkSpec extends AnyFunSuite {

  test("Pages package sniffs as iWork, not generic zip") {
    val p = PagesWriter.pages(Seq("Title", "body"))
    assert(MimeSniffer.sniff(p) == MimeSniffer.Iwork)
    // a plain zip with an index.xml but no QuickLook stays a zip
    val z = extractous.gen.DocxWriter.zip(Seq("index.xml" -> "<a/>".getBytes))
    assert(MimeSniffer.sniff(z) == MimeSniffer.Zip)
    // a zip whose member CONTENT merely mentions the marker strings stays a
    // zip (entry names come from the central directory, not a byte scan)
    val decoy = extractous.gen.DocxWriter.zip(Seq(
      "readme.txt" -> "see index.xml and QuickLook/Thumbnail.jpg for details".getBytes))
    assert(MimeSniffer.sniff(decoy) == MimeSniffer.Zip)
    // same class for the office rungs: content mentioning word/ or xl/ must
    // not misroute the archive to an office parser
    val decoy2 = extractous.gen.DocxWriter.zip(Seq(
      "notes.txt" -> "paths: word/document.xml and xl/workbook.xml and ppt/slides".getBytes))
    assert(MimeSniffer.sniff(decoy2) == MimeSniffer.Zip)
    val r = extractous.core.Extract(decoy2)
    assert(r.status == extractous.model.ExtractStatus.Ok &&
      r.text.contains("word/document.xml")) // extracted as an archive member, not lost
  }

  test("paragraphs extract in document order with entities unescaped") {
    val r = Extract(PagesWriter.pages(Seq("Document 3", "a < b & c > d", "tail")))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Document 3\na < b & c > d\ntail")
    assert(r.contentType == "application/vnd.apple.pages")
    assert(r.metadata("iwork:paragraph-count") == Seq("3"))
  }

  test("XML output mode wraps paragraphs") {
    val cfg = extractous.config.ExtractorConfig.default.copy(xmlOutput = true)
    val r = Extract(PagesWriter.pages(Seq("one", "two")), cfg)
    assert(r.xml.contains("<p>one</p>") && r.xml.contains("<p>two</p>"))
  }

  test("non-Pages index.xml and missing index.xml fail with a status, never wrong text") {
    // iWork-shaped zip whose index.xml is not a Pages sl:document
    val notPages = extractous.gen.DocxWriter.zip(Seq(
      "index.xml" -> "<ls:document xmlns:ls=\"x\"><ls:workspace/></ls:document>".getBytes,
      "QuickLook/Thumbnail.jpg" -> Array[Byte](1)))
    val r = Extract(notPages)
    assert(r.status == ExtractStatus.UnsupportedFormat && r.text == "")
    // IWA-era package: QuickLook but Index.zip instead of index.xml → generic
    // zip whose members (truncated inner zip, truncated JPEG) all fail → the
    // row fails rather than emitting junk
    val iwa = extractous.gen.DocxWriter.zip(Seq(
      "Index.zip" -> Array[Byte](0x50, 0x4b, 3, 4),
      "QuickLook/Thumbnail.jpg" -> Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
    assert(Extract(iwa).status != ExtractStatus.Ok)
  }

  test("mutation fuzz: 200 single-byte mutants never throw") {
    val good = PagesWriter.pages(Seq("Document 1", "some body text"))
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Extract(m)
    }
  }
}
