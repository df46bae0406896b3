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
  test("DRI/RSTn restart intervals: binarized roundtrip stays pixel-exact") {
    // several intervals incl. ones forcing the D0..D7 index to wrap (>8
    // restarts) and a boundary landing exactly on the last MCU
    val g = GlyphFont.render(Seq("Restart markers rule", "the second line too"))
    val mcus = ((g.width + 7) / 8) * ((g.height + 7) / 8)
    for (ri <- Seq(1, 2, 3, 7, mcus)) {
      val enc = Jpeg.encode(g, ri)
      val g2 = Jpeg.decode(enc)
      assert(g2.pixels.sameElements(g.pixels), s"restartInterval=$ri roundtrip drift")
    }
    // sanity: interval 1 on a multi-MCU image really does emit RSTn bytes
    val enc1 = Jpeg.encode(g, 1)
    assert((0 until enc1.length - 1).exists(i =>
      (enc1(i) & 0xff) == 0xff && (enc1(i + 1) & 0xff) >= 0xd0 && (enc1(i + 1) & 0xff) <= 0xd7))
  }
  test("out-of-sync restart markers fail with a status, never garbage pixels") {
    val g = GlyphFont.render(Seq("sync check line one", "and a second line!!"))
    val enc = Jpeg.encode(g, 2)
    // corrupt the first RSTn to the wrong index → decoder must throw
    val idx = (0 until enc.length - 1).find(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xd0).get
    val bad = enc.clone()
    bad(idx + 1) = 0xd5.toByte
    val e = intercept[IllegalArgumentException] { Jpeg.decode(bad) }
    assert(e.getMessage.contains("restart"))
  }
  test("SOF claiming ~46k x 46k hits the dim cap, not a ~2 GB luma allocation") {
    val sof = Array[Int](0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b,
      8, 46340 >> 8, 46340 & 0xff, 46340 >> 8, 46340 & 0xff, 1, 1, 0x11, 0)
      .map(_.toByte)
    val e = intercept[IllegalArgumentException] { Jpeg.decode(sof) }
    assert(e.getMessage.contains("dims out of range"))
  }
  test("dimensions: EOI before SOF and stray no-payload markers raise cleanly") {
    // SOI then EOI — previously read a bogus length past the buffer
    val eoiOnly = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    val e = intercept[IllegalArgumentException] { Jpeg.dimensions(eoiOnly) }
    assert(e.getMessage.contains("no SOF"))
    // TEM + RSTn before SOF are payload-less and must be stepped over
    val g = GlyphFont.render(Seq("dims"))
    val enc = Jpeg.encode(g)
    val withTem = Array(0xff, 0xd8, 0xff, 0x01, 0xff, 0xd3).map(_.toByte) ++ enc.drop(2)
    assert(Jpeg.dimensions(withTem) == ((g.width, g.height)))
  }
}
