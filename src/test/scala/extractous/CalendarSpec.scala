package extractous

import extractous.core.Extract
import extractous.gen.CorpusGen
import extractous.mail.CalendarExtractor
import extractous.model.ExtractStatus
import extractous.sniff.MimeSniffer
import org.scalatest.funsuite.AnyFunSuite

/** iCalendar / vCard: unfolding, TEXT escapes, component walks, and the
  * fail-with-status posture for empty calendars.
  */
class CalendarSpec extends AnyFunSuite {

  test("ics: folded DESCRIPTION with escapes round-trips; SUMMARY/DESCRIPTION/LOCATION order") {
    val text = "a long line with, commas; and more prose " * 4
    val r = Extract(CorpusGen.calPayload(2, text.trim))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == s"Document 2\n${text.trim}\nRoom 2")
    assert(r.contentType == "text/calendar")
    assert(r.metadata("calendar:component-count") == Seq("1"))
  }

  test("vcf: FN/ORG/NOTE order, params stripped") {
    val r = Extract(CorpusGen.calPayload(101, "note body, with comma"))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Document 101\nExample Corp 101\nnote body, with comma")
    assert(r.contentType == "text/vcard")
  }

  test("escaped newline in TEXT value becomes a real line break") {
    val ics = "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:line one\\nline two\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n"
    val r = Extract(ics.getBytes)
    assert(r.status == ExtractStatus.Ok && r.text == "line one\nline two")
  }

  test("quoted parameter value containing ':' does not corrupt the text (RFC 5545 ALTREP)") {
    val ics = "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n" +
      "DESCRIPTION;ALTREP=\"CID:part3.msg@example.com\":Project XYZ Review Meeting\r\n" +
      "END:VEVENT\r\nEND:VCALENDAR\r\n"
    val r = Extract(ics.getBytes)
    assert(r.status == ExtractStatus.Ok && r.text == "Project XYZ Review Meeting")
  }

  test("nested VALARM is skipped wholly — its DESCRIPTION never leaks into the event") {
    val ics = "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:Standup\r\n" +
      "BEGIN:VALARM\r\nACTION:DISPLAY\r\nDESCRIPTION:Reminder\r\nEND:VALARM\r\n" +
      "DESCRIPTION:Daily sync\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n"
    val r = Extract(ics.getBytes)
    assert(r.status == ExtractStatus.Ok && r.text == "Standup\nDaily sync")
  }

  test("calendar with no extractable component fails with a status") {
    val empty = "BEGIN:VCALENDAR\r\nVERSION:2.0\r\nEND:VCALENDAR\r\n"
    val r = Extract(empty.getBytes)
    assert(r.status == ExtractStatus.ExtractionFailed && r.text == "")
  }

  test("sniff: BEGIN:VCALENDAR / BEGIN:VCARD rungs beat the plain-text fallthrough") {
    assert(MimeSniffer.sniff(CorpusGen.calPayload(0, "x")) == MimeSniffer.Ics)
    assert(MimeSniffer.sniff(CorpusGen.calPayload(100, "x")) == MimeSniffer.Vcf)
  }

  test("mutation fuzz: 200 single-byte mutants never throw") {
    val good = CorpusGen.calPayload(3, "body text of the event")
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Extract(m)
    }
  }
}
