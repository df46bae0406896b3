package extractous

import extractous.config.CharSet
import extractous.text.{Encoding, Normalize, TextEmitter, XmlEmitter}
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  test("normalize collapses runs and trims") {
    assert(Normalize.line("  a\t\tb   c  ") == "a b c")
    assert(Normalize.line("\n\r x  y ") == "x y")
    assert(Normalize.line("") == "")
    assert(Normalize.line("   ") == "")
  }
  test("normalize text drops empty lines") {
    assert(Normalize.text("a\n\n  \nb\nc  ") == "a\nb\nc")
  }
  test("emitter joins blocks with single newline, no trailing") {
    val e = new TextEmitter(1000)
    e.addBlock(" one "); e.addBlock(""); e.addBlock("two")
    assert(e.result() == "one\ntwo")
  }
  test("emitter truncates at exactly maxLen chars") {
    val e = new TextEmitter(5)
    e.addBlock("abcdefgh")
    assert(e.result() == "abcde")
    assert(e.isFull)
    assert(!e.addBlock("more"))
  }
  test("emitter truncation across blocks counts separator") {
    val e = new TextEmitter(5)
    e.addBlock("abc"); e.addBlock("def")
    // "abc\nd" = 5 chars
    assert(e.result() == "abc\nd")
  }
  test("emitter never ends on separator") {
    val e = new TextEmitter(4)
    e.addBlock("abcd"); e.addBlock("x")
    assert(e.result() == "abcd")
  }
  test("truncation property: length <= maxLen (seeded random)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val blocks = List.fill(rnd.nextInt(8))(rnd.alphanumeric.take(rnd.nextInt(120)).mkString(" "))
      val e = new TextEmitter(n)
      blocks.foreach(e.addBlock)
      val r = e.result()
      assert(r.length <= n, s"n=$n got ${r.length}")
      assert(!r.endsWith("\n"))
    }
  }
  test("xml emitter escapes") {
    val x = new XmlEmitter(1000)
    x.addElement("p", "a < b & c > d")
    assert(x.result() == "<doc>\n<p>a &lt; b &amp; c &gt; d</p>\n</doc>")
  }
  test("ascii encoding folds non-ascii") {
    assert(Encoding("héllo", CharSet.UsAscii) == "h?llo")
    assert(Encoding("héllo", CharSet.Utf8) == "héllo")
    assert(Encoding("héllo こんにちは", CharSet.Utf16Be) == "héllo こんにちは")
  }
}
