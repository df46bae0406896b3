package extractous

import extractous.config.ExtractorConfig
import extractous.html.HtmlExtractor
import org.scalatest.funsuite.AnyFunSuite

/** Generative property (FIXTURES.md §5): for randomly assembled pages, the
  * extractor recovers EXACTLY the article content (byte-identical, in order)
  * and none of the boilerplate — across 300 seeded random page layouts.
  */
class HtmlPropertySpec extends AnyFunSuite {
  private val words = Vector("data", "table", "spark", "query", "window", "stream",
    "batch", "filter", "merge", "column", "value", "scan", "row", "sort", "group",
    "join", "hash", "vector", "fast", "slow", "key", "part", "order", "line")

  private def sentence(rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")

  test("random page layouts: article recovered byte-identically, boilerplate never leaks") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 300).foreach { seed =>
      val nav = Seq.fill(1 + rnd.nextInt(4))(s"""<a href="/n${rnd.nextInt(99)}">${sentence(rnd, 1 + rnd.nextInt(2))}</a>""").mkString(" ")
      val sidebarWord = "zzboiler" + rnd.nextInt(1000) // marker that must never appear
      val paras = Seq.fill(1 + rnd.nextInt(5))(sentence(rnd, 12 + rnd.nextInt(20)))
      val heading = sentence(rnd, 2 + rnd.nextInt(3))
      val useMain = rnd.nextBoolean()
      val openTag = if (useMain) "<main><article>" else "<article>"
      val closeTag = if (useMain) "</article></main>" else "</article>"
      val headerBlock = if (rnd.nextBoolean()) s"<header><a href='/'>$sidebarWord home</a></header>" else ""
      val asideBlock = if (rnd.nextBoolean()) s"<aside>$sidebarWord promo text</aside>" else ""
      val footerBlock = s"<footer>$sidebarWord footer <a href='/t'>terms</a></footer>"
      val html =
        s"""<!DOCTYPE html><html><head><title>${sentence(rnd, 3)}</title></head><body>
           |$headerBlock<nav>$nav</nav>
           |<div class="sidebar">$sidebarWord offer</div>
           |$openTag<h1>$heading</h1>${paras.map(p => s"<p>$p</p>").mkString("\n")}$closeTag
           |$asideBlock$footerBlock</body></html>""".stripMargin
      val r = HtmlExtractor.extract(html.getBytes("UTF-8"), ExtractorConfig())
      val expected = (heading +: paras).mkString("\n")
      assert(r.text == expected, s"seed $seed layout mismatch")
      assert(!r.text.contains(sidebarWord), s"seed $seed boilerplate leaked")
    }
  }
}
