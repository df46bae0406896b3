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
  test("BMP 65536x65536 header hits the dim guard, not Int overflow") {
    // width*height overflows Int to 0; the guard must use long math and
    // reject cleanly instead of letting a later alloc/index blow up
    val h = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    h.put('B'.toByte).put('M'.toByte)
    h.putInt(10, 54)      // data offset
    h.putInt(18, 65536)   // width
    h.putInt(22, 65536)   // height
    h.putShort(28, 24)    // bpp
    val e = intercept[IllegalArgumentException] { Bmp.decode(h.array()) }
    assert(e.getMessage.contains("dims out of range"))
  }
  test("PNG claiming 2^30 x 2 pixels is rejected before any allocation") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    val ihdr = java.nio.ByteBuffer.allocate(8 + 13 + 4)
    ihdr.putInt(13); ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(1 << 30); ihdr.putInt(2)
    ihdr.put(8: Byte).put(0: Byte).put(0: Byte).put(0: Byte).put(0: Byte)
    ihdr.putInt(0) // CRC unchecked by the decoder
    out.write(ihdr.array())
    val e = intercept[IllegalArgumentException] { Png.decode(out.toByteArray) }
    assert(e.getMessage.contains("dims out of range"))
  }
  test("PNG whose zlib stream sets FDICT throws instead of spinning forever") {
    val png = Png.encode(GlyphFont.render(Seq("fdict test")))
    // locate the IDAT payload and set the zlib FDICT bit, re-fixing FCHECK
    val idx = (0 until png.length - 4).find(i =>
      png(i) == 'I' && png(i + 1) == 'D' && png(i + 2) == 'A' && png(i + 3) == 'T').get
    val cmf = png(idx + 4) & 0xff
    var flg = (png(idx + 5) & 0xff) | 0x20          // FDICT on
    flg = (flg & 0xe0) | ((31 - (cmf * 256 + (flg & 0xe0)) % 31) % 31)
    val bad = png.clone(); bad(idx + 5) = flg.toByte
    val e = intercept[IllegalArgumentException] { Png.decode(bad) }
    assert(e.getMessage.contains("preset dictionary"))
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
