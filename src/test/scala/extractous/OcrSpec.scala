package extractous

import extractous.config.OcrConfig
import extractous.ocr._
import org.scalatest.funsuite.AnyFunSuite

class OcrSpec extends AnyFunSuite {
  private val cfg = OcrConfig()

  test("bmp encode/decode roundtrip") {
    val g = GlyphFont.render(Seq("AbZ 09!?"))
    val g2 = Bmp.decode(Bmp.encode(g))
    assert(g2.width == g.width && g2.height == g.height)
    assert(g2.pixels.sameElements(g.pixels))
  }
  test("png encode/decode roundtrip") {
    val g = GlyphFont.render(Seq("Hello png", "line two"))
    val g2 = Png.decode(Png.encode(g))
    assert(g2.pixels.sameElements(g.pixels))
  }
  test("clean recognition is exact") {
    val text = Seq("The quick brown fox", "jumps over 13 dogs!")
    val img = Bmp.encode(GlyphFont.render(text))
    assert(GlyphTemplateOcr.recognize(img, cfg) == text.mkString("\n"))
  }
  test("noisy recognition still exact (nearest-template tolerance)") {
    val text = Seq("noisy sample 42")
    val img = Png.encode(GlyphFont.render(text, noiseSeed = 1234L))
    assert(GlyphTemplateOcr.recognize(img, cfg) == "noisy sample 42")
  }
  test("preprocessing despeckle also works") {
    val text = Seq("preproc run")
    val img = Bmp.encode(GlyphFont.render(text, noiseSeed = 99L))
    assert(GlyphTemplateOcr.recognize(img, cfg.copy(enableImagePreprocessing = true)) == "preproc run")
  }
  test("unsupported chars render as ?") {
    val img = Bmp.encode(GlyphFont.render(Seq("café")))
    assert(GlyphTemplateOcr.recognize(img, cfg) == "caf?")
  }
  test("trailing spaces trimmed per line") {
    val img = Bmp.encode(GlyphFont.render(Seq("short", "a much longer line")))
    assert(GlyphTemplateOcr.recognize(img, cfg) == "short\na much longer line")
  }
  test("truncated bmp raises (mapped to -10 upstream)") {
    val img = Bmp.encode(GlyphFont.render(Seq("x")))
    intercept[Exception] { GlyphTemplateOcr.recognize(img.take(30), cfg) }
  }
}
