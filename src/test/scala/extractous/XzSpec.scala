package extractous

import org.scalatest.funsuite.AnyFunSuite
import extractous.core.{Extract, Xz}
import extractous.gen.{CorpusGen, TarWriter, XzWriter}
import extractous.model.ExtractStatus
import extractous.sniff.MimeSniffer

/** XZ container: the from-scratch reader (core.Xz) against the independent
  * writer (gen.XzWriter) — a genuine two-implementation oracle of the
  * container framing on top of the LZMA2 round-trip already proven in
  * LzmaSpec.
  */
class XzSpec extends AnyFunSuite {

  private val sample =
    ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8")

  test("round-trips under every spec check type (None/CRC32/CRC64/SHA-256)") {
    for (ct <- Seq(0, 1, 4, 10)) {
      val packed = XzWriter.xz(sample, checkType = ct)
      assert(java.util.Arrays.equals(Xz.decode(packed), sample), s"check type $ct")
    }
  }

  test("compresses repetitive text and survives empty/1-byte inputs") {
    assert(XzWriter.xz(sample).length < sample.length / 2)
    for (d <- Seq(Array.emptyByteArray, Array[Byte](7))) {
      assert(java.util.Arrays.equals(Xz.decode(XzWriter.xz(d)), d))
    }
  }

  test("property: 60 random mixed-entropy payloads round-trip byte-identically") {
    val rnd = new scala.util.Random(46)
    for (i <- 0 until 60) {
      val n = rnd.nextInt(40000)
      val d = new Array[Byte](n)
      var j = 0
      while (j < n) {
        // mixed entropy: mostly a 4-letter alphabet (compressible runs and
        // matches), every 4th byte fully random (literal/mismatch pressure)
        d(j) = if (rnd.nextInt(4) == 0) rnd.nextInt(256).toByte else ('a' + rnd.nextInt(4)).toByte
        j += 1
      }
      val ct = Seq(0, 1, 4, 10)(i % 4)
      assert(java.util.Arrays.equals(Xz.decode(XzWriter.xz(d, ct)), d), s"seed $i")
    }
  }

  test("concatenated streams (cat a.xz b.xz, spec §2) decode in sequence") {
    // golden: the REAL xz CLI (5.x) — `xz -9 a | xz -1 --check=crc32 b`
    // concatenated, mixed presets AND mixed check types across the boundary
    val cli = java.util.Base64.getDecoder.decode(
      "/Td6WFoAAATm1rRGBMAuKiEBHAAAAAAAAAAAAK6loEwBAClmaXJzdCBzdHJlYW0gcGF5bG9hZCBm" +
      "cm9tIHRoZSByZWFsIHh6IGNsaQoAAAB3XpitIf1gbAABSipy26vxH7bzfQEAAAAABFla/Td6WFoA" +
      "AAFpIt42BMArJyEBEAAAAAAAAAAAADNLE5UBACZzZWNvbmQgc3RyZWFtLCBkaWZmZXJlbnQgY29u" +
      "dGVudCAxMjM0NQoAAIP3ANgAAUMnhhzYXpBCmQ0BAAAAAAFZWg==")
    assert(new String(Xz.decode(cli), "UTF-8") ==
      "first stream payload from the real xz cli\nsecond stream, different content 12345\n")
    // writer-produced three-way concat with stream padding between streams
    val parts = Seq("alpha ".getBytes("UTF-8"), "beta ".getBytes("UTF-8"),
      Array.fill(5000)('q'.toByte))
    val packed = XzWriter.xz(parts(0)) ++ new Array[Byte](8) ++
      XzWriter.xz(parts(1), checkType = 1) ++ XzWriter.xz(parts(2), checkType = 10)
    assert(java.util.Arrays.equals(Xz.decode(packed), parts.reduce(_ ++ _)))
    // trailing garbage after a stream is a loud error, not silent loss
    intercept[IllegalArgumentException](
      Xz.decode(XzWriter.xz(parts(0)) ++ "junk1234".getBytes("UTF-8")))
  }

  test("extract dispatch: .xz text decodes and records the wrapper; .tar.xz recurses") {
    val txt = XzWriter.xz("hello from xz".getBytes("UTF-8"))
    assert(MimeSniffer.sniff(txt) == "application/x-xz")
    val r = Extract(txt)
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "hello from xz")
    assert(r.metadata("Content-Encoding") == Seq("xz"))

    val html = CorpusGen.htmlPayload(3, "xz tar body", "en")
    val tarXz = XzWriter.xz(TarWriter.tar(Seq(
      "a.html" -> html, "b.txt" -> "note".getBytes("UTF-8"))), checkType = 4)
    val rt = Extract(tarXz)
    assert(rt.status == ExtractStatus.Ok, rt.error)
    assert(rt.text == "Document 3\nthe and of to in\nxz tar body\nnote")
    assert(rt.metadata("tar:member-count") == Seq("2"))
  }

  test("damage anywhere → typed failure, never garbage text") {
    val packed = XzWriter.xz(sample)
    // every CRC-guarded region: stream flags, block header, data (via block
    // check), index, footer
    for (pos <- Seq(7, 13, packed.length / 2, packed.length - 20, packed.length - 6)) {
      val mut = packed.clone()
      mut(pos) = (mut(pos) ^ 0x40).toByte
      val r = Extract(mut)
      // every flipped region is CRC-guarded, so the row FAILS - it never
      // silently yields altered text
      assert(r.status != ExtractStatus.Ok && r.text == "", s"pos $pos: ${r.status} ${r.error}")
    }
    // truncation inside the compressed body
    val cut = java.util.Arrays.copyOf(packed, packed.length - 30)
    val rc = Extract(cut)
    assert(rc.status == ExtractStatus.ExtractionFailed && rc.text == "")
  }

  test("filter chains and reserved check types refuse with -8, never -4 garbage") {
    // hand-build a header declaring a Delta+LZMA2 chain: flags byte 0x01 (two
    // filters) — the reader must refuse before touching any data
    val packed = XzWriter.xz(sample)
    val mut = packed.clone()
    // block header starts at offset 12: [size][flags]...; set numFilters=2
    mut(13) = 0x01
    // fix the block header CRC so the refusal is about the FILTERS, not CRC
    val bhs = mut(12) & 0xff
    val headerLen = (bhs + 1) * 4
    val c = { val cc = new java.util.zip.CRC32(); cc.update(mut, 12, headerLen - 4); cc.getValue }
    (0 until 4).foreach(i => mut(12 + headerLen - 4 + i) = ((c >>> (8 * i)) & 0xff).toByte)
    val r = Extract(mut)
    assert(r.status == ExtractStatus.UnsupportedFormat, s"${r.status} ${r.error}")
    assert(r.error.contains("filter"))

    val mut2 = packed.clone()
    // declare the reserved check id 0x02 consistently in header AND footer
    // (the multi-stream walk reads the footer first; a header/footer
    // disagreement is a different, structural -4 failure)
    mut2(7) = 0x02
    val cf = { val cc = new java.util.zip.CRC32(); cc.update(mut2, 6, 2); cc.getValue }
    (0 until 4).foreach(i => mut2(8 + i) = ((cf >>> (8 * i)) & 0xff).toByte)
    val e2 = mut2.length
    mut2(e2 - 3) = 0x02
    val ff = { val cc = new java.util.zip.CRC32(); cc.update(mut2, e2 - 8, 6); cc.getValue }
    (0 until 4).foreach(i => mut2(e2 - 12 + i) = ((ff >>> (8 * i)) & 0xff).toByte)
    val r2 = Extract(mut2)
    assert(r2.status == ExtractStatus.UnsupportedFormat, s"${r2.status} ${r2.error}")
    assert(r2.error.contains("check type"))
  }

  test("bomb cap: declared output beyond the cap is refused before allocation") {
    val packed = XzWriter.xz(sample)
    val e = intercept[IllegalStateException](Xz.decode(packed, cap = 16))
    assert(e.getMessage.contains("cap"))
  }
}
