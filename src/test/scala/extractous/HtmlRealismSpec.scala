package extractous

import extractous.config.{ExtractorConfig, HtmlMode}
import extractous.html.HtmlExtractor
import org.scalatest.funsuite.AnyFunSuite

/** Hand-verified goldens for realistic page shapes beyond the generator's
  * template — freezes the boilerplate classifier's behavior on structures a
  * crawl actually contains (nested articles, tables, figure captions, inline
  * markup, blog-like class names, link farms).
  */
class HtmlRealismSpec extends AnyFunSuite {
  private def extract(html: String) = HtmlExtractor.extract(html.getBytes("UTF-8"), ExtractorConfig())

  test("news-like page: headline, dek, body kept; chrome dropped") {
    val html =
      """<!DOCTYPE html>
        |<html><head><title>Quarterly results beat expectations</title></head><body>
        |<div id="masthead"><a href="/">The Daily Ledger</a><a href="/subscribe">Subscribe for $1</a></div>
        |<nav class="site-nav"><a href="/politics">Politics</a><a href="/business">Business</a><a href="/tech">Tech</a></nav>
        |<main>
        |<article>
        |<h1>Quarterly results beat expectations</h1>
        |<p class="dek">Revenue rose for the third straight quarter, driven by services growth.</p>
        |<p>The company reported earnings on Tuesday that exceeded analyst estimates, sending shares higher in late trading.</p>
        |<figure><img src="/x.jpg"><figcaption>The headquarters building on Tuesday.</figcaption></figure>
        |<p>Executives credited strong demand and <em>disciplined</em> cost control for the performance this quarter.</p>
        |</article>
        |</main>
        |<aside class="related"><a href="/a">Related: markets rally</a><a href="/b">Related: sector outlook</a></aside>
        |<footer><a href="/tos">Terms</a><a href="/privacy">Privacy</a>© 2024 The Daily Ledger</footer>
        |</body></html>""".stripMargin
    val r = extract(html)
    assert(r.text ==
      "Quarterly results beat expectations\n" +
        "Revenue rose for the third straight quarter, driven by services growth.\n" +
        "The company reported earnings on Tuesday that exceeded analyst estimates, sending shares higher in late trading.\n" +
        "The headquarters building on Tuesday.\n" +
        "Executives credited strong demand and disciplined cost control for the performance this quarter.")
  }

  test("blog page with content-class div instead of article tag") {
    val html =
      """<html><body>
        |<div class="sidebar"><a href="/t1">tag one</a><a href="/t2">tag two</a></div>
        |<div class="post-content">
        |<p>Short intro.</p>
        |<p>This longer paragraph carries the substance of the post and easily clears the word-count threshold used by the classifier.</p>
        |</div>
        |</body></html>""".stripMargin
    val r = extract(html)
    assert(r.text == "Short intro.\nThis longer paragraph carries the substance of the post and easily clears the word-count threshold used by the classifier.")
  }

  test("data table inside content keeps cell text row by row") {
    val html =
      """<html><body><article>
        |<p>The results by region are summarized in the following table today.</p>
        |<table><tr><th>Region</th><th>Revenue</th></tr>
        |<tr><td>North America</td><td>120</td></tr>
        |<tr><td>Europe</td><td>95</td></tr></table>
        |</article></body></html>""".stripMargin
    val r = extract(html)
    assert(r.text ==
      "The results by region are summarized in the following table today.\nRegion\nRevenue\nNorth America\n120\nEurope\n95")
  }

  test("link farm is dropped even without boilerplate class names") {
    val html =
      """<html><body>
        |<div><a href="/1">buy cheap widgets</a> <a href="/2">best widget deals</a> <a href="/3">widget coupons</a></div>
        |<div>Genuine sentence content with enough words to be considered the main body of this page.</div>
        |</body></html>""".stripMargin
    val r = extract(html)
    assert(r.text == "Genuine sentence content with enough words to be considered the main body of this page.")
  }

  test("inline formatting does not fragment a paragraph") {
    val html = "<html><body><article><p>Mixed <b>bold</b>, <i>italic</i>, <code>code()</code> and <a href='/x'>linked words</a> flow as one block.</p></article></body></html>"
    val r = extract(html)
    assert(r.text == "Mixed bold, italic, code() and linked words flow as one block.")
  }

  test("nested lists under article keep item granularity") {
    val html =
      """<html><body><article><h2>Checklist</h2>
        |<ul><li>First item with several supporting words</li>
        |<li>Second item <ul><li>nested child item text here</li></ul></li></ul>
        |</article></body></html>""".stripMargin
    val r = extract(html)
    assert(r.text == "Checklist\nFirst item with several supporting words\nSecond item\nnested child item text here")
  }

  test("alltext mode on the news page keeps chrome (reference-style)") {
    val html = "<html><head><title>T</title></head><body><nav><a href='/x'>NavItem</a></nav><article><p>Body content words sufficient for keeping anyway</p></article></body></html>"
    val r = HtmlExtractor.extract(html.getBytes("UTF-8"), ExtractorConfig(htmlMode = HtmlMode.AllText))
    assert(r.text == "T\nNavItem\nBody content words sufficient for keeping anyway")
  }
}
