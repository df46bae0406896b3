package extractous

import extractous.ocr._
import extractous.config.OcrConfig
import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {
  test("binarized roundtrip is pixel-exact on glyph renders") {
    for (seed <- Seq(0L, 17L, 99L)) {
      val g = GlyphFont.render(Seq("The quick brown fox", "jumps over 13 dogs!"), noiseSeed = seed)
      val g2 = Jpeg.decode(Jpeg.encode(g))
      assert(g2.width == g.width && g2.height == g.height)
      assert(g2.pixels.sameElements(g.pixels), s"seed $seed roundtrip drift")
    }
  }
  test("roundtrip exact on non-multiple-of-8 dimensions") {
    val g = GlyphFont.render(Seq("x"))  // 16x20
    assert(g.width % 8 != 0 || g.height % 8 != 0)
    val g2 = Jpeg.decode(Jpeg.encode(g))
    assert(g2.pixels.sameElements(g.pixels))
  }
  test("OCR reads text from a JPEG scan") {
    val img = Jpeg.encode(GlyphFont.render(Seq("JPEG 42 scan")))
    assert(GlyphTemplateOcr.recognize(img, OcrConfig()) == "JPEG 42 scan")
  }
  test("dimensions parses SOF without full decode") {
    val g = GlyphFont.render(Seq("dim probe"))
    assert(Jpeg.dimensions(Jpeg.encode(g)) == ((g.width, g.height)))
  }
  test("progressive/truncated inputs raise cleanly") {
    val enc = Jpeg.encode(GlyphFont.render(Seq("t")))
    intercept[Exception] { Jpeg.decode(enc.take(enc.length / 2)) }
    val prog = enc.clone(); // flip SOF0 -> SOF2 marker
    val sofIdx = (0 until prog.length - 1).find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofIdx + 1) = 0xc2.toByte
    intercept[Exception] { Jpeg.decode(prog) }
  }
}
