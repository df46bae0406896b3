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

  test("truncation never splits a surrogate pair") {
    val e = new TextEmitter(4)
    e.addBlock("abc😀z")
    assert(e.result() == "abc") // cutting at 4 would strand the high surrogate
    val e2 = new TextEmitter(5)
    e2.addBlock("abc😀z")
    assert(e2.result() == "abc😀") // whole pair fits
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val s = (1 to 20).map(_ => if (rnd.nextBoolean()) "😀" else "ab").mkString
      val e3 = new TextEmitter(1 + rnd.nextInt(12))
      e3.addBlock(s)
      val r = e3.result()
      if (r.nonEmpty) assert(!Character.isHighSurrogate(r.charAt(r.length - 1)), s"input=$s")
    }
  }

  test("xml emitter caps an oversized element during emission, not after") {
    val x = new XmlEmitter(10)
    x.addElement("p", "a" * 1000)
    assert(x.isFull)
    assert(x.result().length < 40, x.result()) // text budget + tag overhead, never the full element
    // maxLen 9 minus the 5-char "<doc>" prefix leaves a 4-char text budget;
    // cutting at 4 would strand the high surrogate → backs off to "abc"
    val x2 = new XmlEmitter(9)
    x2.addElement("p", "abc😀zzz")
    assert(x2.result() == "<doc>\n<p>abc</p>\n</doc>")
  }

  test("lowerAscii/upperAscii: locale-independent, length-preserving, non-ASCII untouched") {
    assert(Normalize.lowerAscii("TITLE-Ä9") == "title-Ä9")
    assert(Normalize.upperAscii("div9ß") == "DIV9ß")
    // U+0130: String.toLowerCase would GROW this to two chars and desync indices
    assert(Normalize.lowerAscii("İI") == "İi")
    assert(Normalize.lowerAscii("already lower") eq "already lower") // no-copy fast path
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(Normalize.lowerAscii("TITLE") == "title") // not "tıtle"
      assert(Normalize.upperAscii("i") == "I")         // not "İ"
    } finally java.util.Locale.setDefault(saved)
  }
}
