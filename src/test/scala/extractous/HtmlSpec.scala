package extractous

import extractous.config.{ExtractorConfig, HtmlMode}
import extractous.html.{HtmlExtractor, HtmlTokenizer}
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  private val cfg = ExtractorConfig()
  private def extract(html: String, c: ExtractorConfig = cfg) =
    HtmlExtractor.extract(html.getBytes("UTF-8"), c)

  test("entities decode") {
    assert(HtmlTokenizer.decodeEntities("a &amp; b &lt;x&gt; &#65;&#x42; &nbsp;done") == "a & b <x> AB  done")
    assert(HtmlTokenizer.decodeEntities("no entities") == "no entities")
    assert(HtmlTokenizer.decodeEntities("&bogus; stays") == "&bogus; stays")
  }

  test("main content kept, boilerplate dropped") {
    val html =
      """<html><head><title>T</title></head><body>
        |<nav><a href="/a">AAA</a> <a href="/b">BBB</a></nav>
        |<div class="sidebar">Buy our product now great deal</div>
        |<article><h1>Heading One</h1><p>This is the real article body with many interesting words to read.</p></article>
        |<footer>Copyright Notice <a href="/t">Terms</a></footer>
        |</body></html>""".stripMargin
    val r = extract(html)
    assert(r.text == "Heading One\nThis is the real article body with many interesting words to read.")
    assert(r.metadata("dc:title") == Seq("T"))
    assert(r.metadata("Content-Type").head.startsWith("text/html"))
  }

  test("alltext mode keeps everything incl title") {
    val html = "<html><head><title>T</title></head><body><nav><a href='/a'>NavLink</a></nav><p>Body words here</p></body></html>"
    val r = extract(html, cfg.copy(htmlMode = HtmlMode.AllText))
    assert(r.text == "T\nNavLink\nBody words here")
  }

  test("link-density heuristic drops linky blocks outside explicit scopes") {
    val html = "<html><body><div><a href='/1'>one two three four five</a> six</div>" +
      "<div>plain words spread over more than ten tokens to stay well clear of thresholds</div></body></html>"
    val r = extract(html)
    assert(r.text == "plain words spread over more than ten tokens to stay well clear of thresholds")
  }

  test("malformed html tolerated") {
    val html = "<html><body><p>unclosed paragraph <b>bold run <p>second para with plenty of additional words to keep</p></body>"
    val r = extract(html, cfg.copy(htmlMode = HtmlMode.AllText))
    assert(r.text.contains("unclosed paragraph bold run"))
    assert(r.text.contains("second para with plenty of additional words to keep"))
  }

  test("script/style/comments excluded") {
    val html = "<html><body><script>var x = 'scripttext';</script><style>.c{}</style><!-- comment -->" +
      "<p>visible content words that definitely pass the density threshold okay</p></body></html>"
    val r = extract(html)
    assert(!r.text.contains("scripttext"))
    assert(!r.text.contains(".c{}"))
    assert(!r.text.contains("comment"))
    assert(r.text.startsWith("visible content"))
  }

  test("cjk content survives") {
    val html = "<html><body><article><p>こんにちは世界 これはテストです 日本語のコンテンツ ですます調 確認 完了 です ね 十分 単語</p></article></body></html>"
    val r = extract(html)
    assert(r.text.contains("こんにちは世界"))
  }

  test("xml mode emits structural tags; plain mode does not") {
    val html = "<html><head><title>T</title></head><body><article><h1>Head</h1><p>Paragraph with enough words to be kept around here</p></article></body></html>"
    val r = extract(html, cfg.copy(xmlOutput = true))
    assert(r.xml == "<doc>\n<title>T</title>\n<h1>Head</h1>\n<p>Paragraph with enough words to be kept around here</p>\n</doc>")
    assert(!r.text.contains("<"))
  }

  test("br splits blocks; meta collected multi-valued") {
    val html = "<html><head><meta name='k' content='v1'><meta name='k' content='v2'></head>" +
      "<body><article><p>first segment of words here<br>second segment of words here</p></article></body></html>"
    val r = extract(html)
    assert(r.text == "first segment of words here\nsecond segment of words here")
    assert(r.metadata("k") == Seq("v1", "v2"))
  }
}
