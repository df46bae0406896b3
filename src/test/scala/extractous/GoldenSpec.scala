package extractous

import extractous.core.Extract
import extractous.gen.CorpusGen
import org.scalatest.funsuite.AnyFunSuite
import java.util.Base64

/** Byte-identical golden suite (FIXTURES.md §3): for every document in the
  * committed manifest, the engine's extracted text must equal the
  * generator-manifest expectation EXACTLY (strict equality, not containment —
  * stricter than the reference's Contains-style assertions, SURVEY.md §5).
  */
class GoldenSpec extends AnyFunSuite {
  private val dec = Base64.getDecoder
  private def rows: Seq[(Long, String, String, String, Int, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/corpus_sf0001.tsv"), "UTF-8")
    try src.getLines().map { line =>
      val f = line.split('\t')
      (f(0).toLong, f(1), new String(dec.decode(f(2)), "UTF-8"),
        new String(dec.decode(f(3)), "UTF-8"), f(4).toInt, f(5))
    }.toVector
    finally src.close()
  }

  test("golden corpus: byte-identical text, status, content-type for all 500 docs") {
    val all = rows
    assert(all.size == 500)
    var checked = 0
    all.foreach { case (id, lang, seedText, expText, expStatus, expCt) =>
      val r = Extract(CorpusGen.payload(id, seedText, lang), CorpusGen.flagshipConfig)
      assert(r.text == expText, s"text mismatch doc_id=$id kind=${CorpusGen.kindOf(id)}")
      assert(r.status == expStatus, s"status mismatch doc_id=$id")
      assert(r.contentType == expCt, s"content-type mismatch doc_id=$id")
      checked += 1
    }
    assert(checked == 500)
  }

  test("every format kind appears in the golden corpus") {
    val kinds = rows.map(r => CorpusGen.kindOf(r._1)).toSet
    assert(kinds == Set("html", "markdown", "eml", "epub", "plain",
      "gbk", "xls", "ppt", "latin1", "sjis",
      "utf16le", "utf16be", "cp1252", "pdf", "docx",
      "doc", "odt", "odp", "image", "scanned_pdf", "empty", "corrupt"))
  }
}
