package extractous

import extractous.core.Extract
import extractous.gen.{CorpusGen, PptWriter, XlsWriter}
import extractous.model.ExtractStatus
import extractous.ocr.{Gif, GlyphFont, Tiff}
import extractous.sniff.MimeSniffer
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 format additions: legacy .xls/.ppt over CFB, GIF/TIFF codecs, and
  * the unlabeled latin-1 / Shift-JIS charset rungs.
  */
class Round3FormatsSpec extends AnyFunSuite {

  // ---- legacy .xls ----
  test(".xls BIFF8 SST/LABELSST roundtrip (mini-stream and FAT paths)") {
    val r = Extract(XlsWriter.xls(Seq("Document 7", "hello legacy sheet")))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Document 7\nhello legacy sheet")
    assert(r.contentType == "application/vnd.ms-excel")
    val big = "cell content " * 500 // past the 4096 mini cutoff
    val r2 = Extract(XlsWriter.xls(Seq("Head", big)))
    assert(r2.status == ExtractStatus.Ok && r2.text == "Head\n" + big.trim)
  }
  test(".xls wide (UTF-16) SST strings survive") {
    val r = Extract(XlsWriter.xls(Seq("Überschrift 日本", "ascii row")))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Überschrift 日本\nascii row")
  }
  test(".xls corrupt LABELSST index fails the row, never wrong text") {
    val bytes = XlsWriter.xls(Seq("a", "b"))
    // find the LABELSST record (type 0x00fd) and point its isst out of range
    val c = extractous.office.Cfb.parse(bytes)
    val wb = c.stream("Workbook").get
    var pos = 0
    var labelAt = -1
    while (pos + 4 <= wb.length && labelAt < 0) {
      val typ = (wb(pos) & 0xff) | ((wb(pos + 1) & 0xff) << 8)
      val len = (wb(pos + 2) & 0xff) | ((wb(pos + 3) & 0xff) << 8)
      if (typ == 0x00fd) labelAt = pos
      else pos += 4 + len
    }
    assert(labelAt > 0)
    // isst lives at +4(header)+6 — corrupt it IN THE CONTAINER (stream data
    // is a contiguous copy; find the byte pattern instead)
    val mut = bytes.clone()
    val probe = wb.slice(labelAt, labelAt + 14)
    val at = (0 until mut.length - probe.length)
      .find(i => probe.indices.forall(j => mut(i + j) == probe(j))).get
    mut(at + 10) = 0x7f.toByte // isst -> huge
    val r = Extract(mut)
    assert(r.status == ExtractStatus.ExtractionFailed && r.text == "")
  }

  // ---- legacy .ppt ----
  test(".ppt TextBytesAtom/TextCharsAtom walk (container descent)") {
    val r = Extract(PptWriter.ppt(Seq("Document 9", "slide body text")))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Document 9\nslide body text")
    assert(r.contentType == "application/vnd.ms-powerpoint")
  }
  test(".ppt wide text (TextCharsAtom) survives") {
    val r = Extract(PptWriter.ppt(Seq("Präsentation 第一", "ascii slide")))
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Präsentation 第一\nascii slide")
  }
  test("CFB with no known application stream is unsupported, not a crash") {
    val bytes = extractous.gen.DocWriter.wrap("SomeOtherStream", Array.fill[Byte](64)(7))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.UnsupportedFormat)
  }

  // ---- Outlook .msg ----
  test(".msg unicode (001F) and ansi (001E) property streams extract subject/sender/body") {
    for (uni <- Seq(true, false)) {
      val r = Extract(extractous.gen.MsgWriter.msg("Document 3", "Sender 3", "mail body café", uni))
      assert(r.status == ExtractStatus.Ok, r.error)
      assert(r.text == "Document 3\nSender 3\nmail body café")
      assert(r.contentType == "application/vnd.ms-outlook")
      assert(r.metadata("subject") == Seq("Document 3"))
    }
  }
  test(".msg body past the mini cutoff takes the regular FAT chain") {
    val big = ("mail paragraph " * 400).trim // > 4096 bytes, > 8192 as UTF-16
    val r = Extract(extractous.gen.MsgWriter.msg("S", "F", big, unicode = true))
    assert(r.status == ExtractStatus.Ok && r.text == s"S\nF\n$big")
  }
  test(".msg attachment substorage cannot shadow the mail's own subject/body") {
    // the attached message's identically-named property streams come FIRST
    // in flat directory order; a flat collectFirst would return them. The
    // reader must walk the root's sibling tree and see only root-level
    // streams (MS-OXMSG: attachments live under __attach_version1.0_#NNNNNNNN)
    def enc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val bytes = extractous.gen.CfbWriter.withStorage(
      "__attach_version1.0_#00000000",
      subStreams = Seq(
        "__substg1.0_0037001F" -> enc("ATTACHED subject"),
        "__substg1.0_1000001F" -> enc("ATTACHED body")),
      rootStreams = Seq(
        "__substg1.0_0037001F" -> enc("Real subject"),
        "__substg1.0_0C1A001F" -> enc("Real sender"),
        "__substg1.0_1000001F" -> enc("Real body")))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "Real subject\nReal sender\nReal body")
    assert(r.metadata("subject") == Seq("Real subject"))
  }
  test(".msg with no text property streams fails the row, never wrong text") {
    val bytes = extractous.gen.CfbWriter.multi(Seq(
      "__substg1.0_30070040" -> Array.fill[Byte](8)(1), // PT_SYSTIME — not text
      "__properties_version1.0" -> Array.fill[Byte](32)(0)))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.UnsupportedFormat && r.text == "")
  }
  // ---- archive recursion (zip / ustar tar) ----
  test("zip archive recurses members in order: html + txt + nested gzip") {
    val html = CorpusGen.htmlPayload(7, "spec body text", "en")
    val gz = { val b = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(b); g.write("zipped note".getBytes("UTF-8")); g.close(); b.toByteArray }
    val bytes = extractous.gen.DocxWriter.zip(Seq(
      "a.html" -> html, "b.txt" -> "plain note".getBytes("UTF-8"), "c.txt.gz" -> gz))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "Document 7\nthe and of to in\nspec body text\nplain note\nzipped note")
    assert(r.contentType == "application/zip")
    assert(r.metadata("zip:member-count") == Seq("3"))
  }
  test("ustar tar walks headers with checksum verification; tar.gz nests through gzip") {
    val tar = extractous.gen.TarWriter.tar(Seq(
      "one.txt" -> "first member".getBytes("UTF-8"),
      "two.txt" -> "second member".getBytes("UTF-8")))
    assert(MimeSniffer.sniff(tar) == "application/x-tar")
    val r = Extract(tar)
    assert(r.status == ExtractStatus.Ok && r.text == "first member\nsecond member")
    assert(r.contentType == "application/x-tar")
    val tgz = { val b = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(b); g.write(tar); g.close(); b.toByteArray }
    val r2 = Extract(tgz)
    assert(r2.status == ExtractStatus.Ok && r2.text == "first member\nsecond member")
  }
  test("corrupt tar (flipped checksum byte) fails the row, never wrong text") {
    val tar = extractous.gen.TarWriter.tar(Seq("a.txt" -> "x".getBytes("UTF-8")))
    val mut = tar.clone(); mut(0) = 'Z'.toByte // name change breaks the stored checksum
    val r = Extract(mut)
    assert(r.status == ExtractStatus.ExtractionFailed && r.text == "")
  }
  test("store-mode 7z recurses members in order like zip/tar; CRC damage fails the row") {
    val html = CorpusGen.htmlPayload(7, "seven zip body", "en")
    val gz = { val b = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(b); g.write("packed note".getBytes("UTF-8")); g.close(); b.toByteArray }
    val bytes = extractous.gen.SevenZWriter.sevenZ(Seq(
      "a.html" -> html, "b.txt" -> "plain note".getBytes("UTF-8"), "c.txt.gz" -> gz))
    assert(MimeSniffer.sniff(bytes) == "application/x-7z-compressed")
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "Document 7\nthe and of to in\nseven zip body\nplain note\npacked note")
    assert(r.metadata("7z:member-count") == Seq("3"))
    // flip a byte inside the end header → CRC mismatch → -4, never wrong text
    val mut = bytes.clone()
    mut(mut.length - 3) = (mut(mut.length - 3) ^ 0x40).toByte
    val rm = Extract(mut)
    assert(rm.status == ExtractStatus.ExtractionFailed && rm.text == "")
  }

  test("7z: aggregate declared unpack size is bomb-capped across ALL folders") {
    // each folder is individually small; the SUM must still trip the budget
    // before any folder is decoded (a crafted archive declaring thousands of
    // near-cap folders would otherwise multiply the per-folder cap)
    val members = (1 to 4).map(i => s"m$i.txt" -> ("x" * 100).getBytes("UTF-8"))
    val bytes = extractous.gen.SevenZWriter.sevenZ(members)
    assert(extractous.core.SevenZip.members(bytes).length == 4) // default budget: fine
    val e = intercept[IllegalArgumentException](
      extractous.core.SevenZip.members(bytes, maxTotal = 350L))
    assert(e.getMessage.contains("aggregate"))
  }

  test("7z LZMA/LZMA2 folders and compressed (kEncodedHeader) metadata extract") {
    val html = CorpusGen.htmlPayload(7, "seven zip body", "en")
    val members = Seq("a.html" -> html, "b.txt" -> "plain note".getBytes("UTF-8"))
    val expected = "Document 7\nthe and of to in\nseven zip body\nplain note"
    for ((coder, eh) <- Seq(("lzma", false), ("lzma2", false), ("copy", true), ("lzma2", true),
        ("bcj-lzma", false), ("delta-lzma2", false), ("bcj-lzma", true))) {
      val bytes = extractous.gen.SevenZWriter.sevenZ(members, coder = coder, encodedHeader = eh)
      assert(MimeSniffer.sniff(bytes) == "application/x-7z-compressed")
      val r = Extract(bytes)
      assert(r.status == ExtractStatus.Ok, s"$coder eh=$eh: ${r.status} ${r.error}")
      assert(r.text == expected, s"$coder eh=$eh")
      assert(r.metadata("7z:member-count") == Seq("2"))
      // LZMA actually compresses: the repetitive HTML member shrinks the
      // archive (filtered chains excluded — x86/delta transforms scramble
      // small NON-code inputs, which is expected and harmless)
      if (coder == "lzma" || coder == "lzma2")
        assert(bytes.length < members.map(_._2.length).sum)
    }
    // truncating a compressed pack stream → typed failure, never a hang/garbage
    val whole = extractous.gen.SevenZWriter.sevenZ(members, coder = "lzma2", encodedHeader = true)
    val cut = java.util.Arrays.copyOf(whole, whole.length / 2)
    val rt = Extract(cut)
    assert(rt.status != ExtractStatus.Ok && rt.text == "")
  }

  test("7z with an unsupported coder (BZip2) and RAR files refuse with -8, never garbage") {
    val bz = extractous.gen.SevenZWriter.unsupportedCoder7z(64)
    val r = Extract(bz)
    assert(r.status == ExtractStatus.UnsupportedFormat, s"${r.status} ${r.error}")
    assert(r.text == "" && r.error.contains("coder"))
    // RAR4: detection-only refusal; RAR5 garbage after a valid signature is
    // structural corruption (store-mode descent now exists — see RarSpec)
    val rar4 = Array[Byte]('R', 'a', 'r', '!', 0x1A, 0x07, 0x00) ++
      Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(MimeSniffer.sniff(rar4) == "application/vnd.rar")
    val r4 = Extract(rar4)
    assert(r4.status == ExtractStatus.UnsupportedFormat && r4.text == "")
    val rar5 = Array[Byte]('R', 'a', 'r', '!', 0x1A, 0x07, 0x01, 0x00) ++
      Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(MimeSniffer.sniff(rar5) == "application/vnd.rar")
    val r5 = Extract(rar5)
    assert(r5.status == ExtractStatus.ExtractionFailed && r5.text == "")
  }

  // Hand-assembled 7z container with an arbitrary end header (all numeric
  // fields < 0x80 → single-byte 7z numbers), CRCs computed so only the
  // TARGETED structural property differs from a valid file.
  private def sevenZWith(packed: Array[Byte], header: Array[Byte]): Array[Byte] = {
    def crc(b: Array[Byte]): Long = { val c = new java.util.zip.CRC32(); c.update(b); c.getValue }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('7', 'z', 0xBC.toByte, 0xAF.toByte, 0x27, 0x1C, 0, 4))
    val sh = new java.io.ByteArrayOutputStream()
    var x = packed.length.toLong
    (0 until 8).foreach { _ => sh.write((x & 0xff).toInt); x >>>= 8 }
    x = header.length.toLong
    (0 until 8).foreach { _ => sh.write((x & 0xff).toInt); x >>>= 8 }
    x = crc(header)
    (0 until 4).foreach { _ => sh.write((x & 0xff).toInt); x >>>= 8 }
    val shb = sh.toByteArray
    x = crc(shb)
    (0 until 4).foreach { _ => out.write((x & 0xff).toInt); x >>>= 8 }
    out.write(shb); out.write(packed); out.write(header)
    out.toByteArray
  }
  private val nameAtxt: Array[Byte] = { // kName: external=0, "a.txt" UTF-16LE + NUL
    val nb = new java.io.ByteArrayOutputStream()
    nb.write(0x11); nb.write(13); nb.write(0)
    nb.write("a.txt".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)); nb.write(0); nb.write(0)
    nb.toByteArray
  }

  test("7z chained-coder folder decodes through the bind pair (round-4 refusal lifted)") {
    // two simple Copy coders wired by bind pair (in 1 ← out 0): the final
    // output is coder 1's, sizes per coder output in coder order
    val header = Array[Byte](0x01, 0x04,
      0x06, 0x00, 0x01, 0x09, 0x02, 0x00,              // PackInfo: 1 stream of 2 B
      0x07, 0x0B, 0x01, 0x00, 0x02,                    // UnPackInfo: 1 folder, TWO coders
      0x01, 0x00, 0x01, 0x00,                          // two simple Copy coders
      0x01, 0x00,                                      // one bind pair
      0x0C, 0x02, 0x02, 0x00, 0x00,                    // unpack sizes + ends
      0x05, 0x01) ++ nameAtxt ++ Array[Byte](0x00, 0x00)
    val r = Extract(sevenZWith("hi".getBytes("US-ASCII"), header))
    assert(r.status == ExtractStatus.Ok, s"${r.status} ${r.error}")
    assert(r.text == "hi")
  }

  test("7z complex (multi-stream) coder still refuses with -8, never garbage") {
    // flag 0x11: id size 1 + the complex bit — the BCJ2-style topology we
    // refuse rather than guess
    val header = Array[Byte](0x01, 0x04,
      0x06, 0x00, 0x01, 0x09, 0x02, 0x00,
      0x07, 0x0B, 0x01, 0x00, 0x01,
      0x11, 0x00, 0x04, 0x01, 0x02, 0x00, // complex coder, 4 in / 1 out
      0x0C, 0x02, 0x00, 0x00,
      0x05, 0x01) ++ nameAtxt ++ Array[Byte](0x00, 0x00)
    val r = Extract(sevenZWith("hi".getBytes("US-ASCII"), header))
    assert(r.status == ExtractStatus.UnsupportedFormat, s"${r.status} ${r.error}")
    assert(r.error.contains("complex"))
  }

  test("7z missing kCodersUnpackSize fails with a typed 7z diagnostic, not AIOOBE") {
    val header = Array[Byte](0x01, 0x04,
      0x06, 0x00, 0x01, 0x09, 0x02, 0x00,              // PackInfo
      0x07, 0x0B, 0x01, 0x00, 0x01, 0x01, 0x00, 0x00,  // UnPackInfo: folder, NO kCodersUnpackSize
      0x00,                                            // end MainStreamsInfo
      0x05, 0x01) ++ nameAtxt ++ Array[Byte](0x00, 0x00)
    val r = Extract(sevenZWith("hi".getBytes("US-ASCII"), header))
    assert(r.status == ExtractStatus.ExtractionFailed)
    assert(r.error.contains("kCodersUnpackSize"), r.error)
  }

  test("7z SubStreamsInfo CRC set skips only folders WITHOUT a folder-level digest") {
    // folder-level kCRC defines the folder's digest; the SubStreams kCRC
    // then carries ZERO digests per spec — the walker must not over-consume
    val header = Array[Byte](0x01, 0x04,
      0x06, 0x00, 0x01, 0x09, 0x02, 0x00,              // PackInfo: 1 stream of 2 B
      0x07, 0x0B, 0x01, 0x00, 0x01, 0x01, 0x00,        // UnPackInfo: 1 Copy folder
      0x0C, 0x02,                                      // unpack size 2
      0x0A, 0x01, 0x11, 0x22, 0x33, 0x44,              // folder-level CRC (defined)
      0x00,                                            // end UnPackInfo
      0x08, 0x0A, 0x01, 0x00,                          // SubStreams: kCRC allDefined, 0 digests
      0x00,                                            // end MainStreamsInfo
      0x05, 0x01) ++ nameAtxt ++ Array[Byte](0x00, 0x00)
    val r = Extract(sevenZWith("hi".getBytes("US-ASCII"), header))
    assert(r.status == ExtractStatus.Ok, s"${r.status} ${r.error}")
    assert(r.text == "hi")
  }

  test("archive whose members all fail extracts nothing and fails the row") {
    val junk = Array.tabulate[Byte](64)(i => ((i * 89 + 3) % 251).toByte)
    val bytes = extractous.gen.DocxWriter.zip(Seq("blob.bin" -> junk))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.ExtractionFailed && r.text == "")
    assert(r.error.contains("zip member 'blob.bin'"))
  }
  test("archive nesting past the depth cap fails the member, not the executor") {
    var inner = extractous.gen.TarWriter.tar(Seq("leaf.txt" -> "deep".getBytes("UTF-8")))
    (1 to 4).foreach { _ => inner = extractous.gen.TarWriter.tar(Seq("wrap.tar" -> inner)) }
    val r = Extract(inner)
    assert(r.status != ExtractStatus.Ok && r.text == "")
  }

  // ---- delimited text (csv/tsv) + mbox ----
  test("csv: quoted cells with embedded delimiter, doubled quotes, and spanning newlines") {
    val csv = "a,b\r\n\"x, y\",\"say \"\"hi\"\"\"\r\n\"line1\nline2\",last\r\n".getBytes("UTF-8")
    assert(MimeSniffer.sniff(csv) == "text/csv")
    val r = Extract(csv)
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "a b\nx, y say \"hi\"\nline1 line2 last")
    assert(r.metadata("csv:delimiter") == Seq(","))
  }
  test("tsv detected by uniform tab count; prose with commas stays plain") {
    val tsv = "col1\tcol2\nv1\tv2\n".getBytes("UTF-8")
    assert(MimeSniffer.sniff(tsv) == "text/csv")
    assert(Extract(tsv).text == "col1 col2\nv1 v2")
    val prose = "hello, world, again\ngoodbye now\n".getBytes("UTF-8") // non-uniform commas
    assert(MimeSniffer.sniff(prose) == "text/plain")
    val single = "one line, with commas".getBytes("UTF-8") // < 2 lines
    assert(MimeSniffer.sniff(single) == "text/plain")
  }
  test("mbox: two messages split on envelope lines, >From unstuffed") {
    val r = Extract(CorpusGen.mboxPayload(5, "body text"))
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "Document 5\nbody text\nRe: Document 5\nbody text\nFrom the archive of 5")
    assert(r.contentType == "application/mbox")
    assert(r.metadata("mbox:message-count") == Seq("2"))
  }
  test("mbox requires a header line after the envelope; bare 'From ' prose stays plain") {
    val prose = "From a certain point of view\nthe story changes\n".getBytes("UTF-8")
    assert(MimeSniffer.sniff(prose) == "text/plain")
  }

  test("CfbWriter.multi containers re-parse with every stream byte-identical") {
    val streams = Seq(
      "small" -> Array.tabulate[Byte](100)(_.toByte),
      "exact64" -> Array.tabulate[Byte](64)(i => (i * 3).toByte),
      "big" -> Array.tabulate[Byte](9000)(i => (i * 7).toByte),
      "empty-ish" -> Array[Byte](42))
    val c = extractous.office.Cfb.parse(extractous.gen.CfbWriter.multi(streams))
    streams.foreach { case (name, data) =>
      assert(c.stream(name).get.toSeq == data.toSeq, name)
    }
  }

  // ---- GIF ----
  test("GIF LZW roundtrip is pixel-exact (incl. dictionary reset on big images)") {
    for (lines <- Seq(Seq("x"), Seq("The quick brown fox", "jumps over 13 dogs!"),
        Seq("A" * 40, "B" * 40, "C" * 40))) {
      val g = GlyphFont.render(lines)
      val g2 = Gif.decode(Gif.encode(g))
      assert(g2.width == g.width && g2.height == g.height)
      assert(g2.pixels.sameElements(g.pixels), s"GIF drift on $lines")
    }
  }
  test("GIF sniffs and OCRs through the full pipeline") {
    val img = Gif.encode(GlyphFont.render(Seq("GIF 77 scan")))
    assert(MimeSniffer.sniff(img) == MimeSniffer.Gif)
    val r = Extract(img, CorpusGen.flagshipConfig)
    assert(r.status == ExtractStatus.Ok && r.text == "GIF 77 scan")
  }
  test("truncated/corrupt GIF fails the row") {
    val img = Gif.encode(GlyphFont.render(Seq("t")))
    val r = Extract(img.take(img.length / 2), CorpusGen.flagshipConfig)
    assert(r.status == ExtractStatus.OcrFailed)
  }

  // ---- TIFF ----
  test("TIFF roundtrip: uncompressed and PackBits, both pixel-exact") {
    val g = GlyphFont.render(Seq("TIFF check line", "and another one"))
    assert(Tiff.decode(Tiff.encode(g, packBits = false)).pixels.sameElements(g.pixels))
    assert(Tiff.decode(Tiff.encode(g, packBits = true)).pixels.sameElements(g.pixels))
  }
  test("TIFF big-endian and 1-bit bilevel decode") {
    val g = GlyphFont.render(Seq("MM order"))
    // hand-build a big-endian 1-bit WhiteIsZero variant
    val rowBytes = (g.width + 7) / 8
    val data = new Array[Byte](rowBytes * g.height)
    for (y <- 0 until g.height; x <- 0 until g.width)
      if (g(x, y) != 0) data(y * rowBytes + x / 8) = (data(y * rowBytes + x / 8) | (1 << (7 - x % 8))).toByte
    val nEntries = 8
    val dataOff = 8 + 2 + nEntries * 12 + 4
    val bb = java.nio.ByteBuffer.allocate(dataOff + data.length).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8).putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit =
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    def entryShort(tag: Int, value: Int): Unit = {
      // SHORT inline value is left-justified in the 4-byte field
      bb.putShort(tag.toShort).putShort(3).putInt(1).putShort(value.toShort).putShort(0)
    }
    entryShort(256, g.width); entryShort(257, g.height); entryShort(258, 1)
    entryShort(259, 1); entryShort(262, 0) // WhiteIsZero: 1 = black
    entry(273, 4, 1, dataOff); entryShort(278, g.height); entry(279, 4, 1, data.length)
    bb.putInt(0); bb.put(data)
    val dec = Tiff.decode(bb.array())
    assert(dec.width == g.width && dec.height == g.height)
    assert(dec.pixels.sameElements(g.pixels))
  }
  test("TIFF with unsupported compression fails cleanly") {
    val g = GlyphFont.render(Seq("z"))
    val enc = Tiff.encode(g)
    // compression tag value offset: entry 4 (259) value at 8+2+3*12+8
    val off = 8 + 2 + 3 * 12 + 8
    enc(off) = 5 // LZW
    val e = intercept[IllegalArgumentException] { Tiff.decode(enc) }
    assert(e.getMessage.contains("compression"))
  }

  // ---- markdown / email / epub ----
  test("markdown: syntax stripped to blocks, fences kept verbatim") {
    val md = "# Title Here\n\nplain paragraph\n\n- item one\n- item two\n\n```\ncode line\n```\n\n[txt](http://x) `c` **b**\n"
    val r = Extract(md.getBytes("UTF-8"))
    assert(r.contentType == "text/markdown")
    assert(r.text == "Title Here\nplain paragraph\nitem one\nitem two\ncode line\ntxt c b")
  }
  test("eml: nested multipart/mixed→alternative finds the text part (attachment shape)") {
    // the STANDARD layout of any email with an attachment
    val eml =
      ("Subject: Nested\n" +
        "Content-Type: multipart/mixed; Boundary=\"outer\"\n" + // capital B: RFC 2045 params are case-insensitive
        "\n--outer\n" +
        "Content-Type: multipart/alternative; boundary=\"inner\"\n" +
        "\n--inner\n" +
        "Content-Type: text/plain\n" +
        "\nthe real body text\n" +
        "--inner\n" +
        "Content-Type: text/html\n" +
        "\n<p>the real body text</p>\n" +
        "--inner--\n" +
        "--outer\n" +
        "Content-Type: application/pdf\n" +
        "Content-Transfer-Encoding: base64\n" +
        "\nAAAA\n" +
        "--outer--\n").getBytes("UTF-8")
    val r = extractous.mail.MailExtractor.extract(eml, extractous.config.ExtractorConfig())
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "Nested\nthe real body text")
  }

  test("eml: declared charset honored in base64 bodies; headerless part defaults to text/plain") {
    val latin1Body = java.util.Base64.getEncoder.encodeToString(
      "café crème".getBytes("ISO-8859-1"))
    val eml =
      ("Subject: Charset\n" +
        "Content-Type: multipart/alternative; boundary=\"b\"\n" +
        "\n--b\n" +
        "Content-Type: text/plain; charset=ISO-8859-1\n" +
        "Content-Transfer-Encoding: base64\n" +
        s"\n$latin1Body\n" +
        "--b--\n").getBytes("UTF-8")
    val r = extractous.mail.MailExtractor.extract(eml, extractous.config.ExtractorConfig())
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "Charset\ncafé crème", r.text) // not U+FFFD mojibake
    // RFC 2046: a part may have NO headers — defaults to text/plain
    val eml2 =
      ("Subject: Bare\n" +
        "Content-Type: multipart/mixed; boundary=\"x\"\n" +
        "\n--x\n" +
        "\nbare default part body\n" +
        "--x--\n").getBytes("UTF-8")
    val r2 = extractous.mail.MailExtractor.extract(eml2, extractous.config.ExtractorConfig())
    assert(r2.status == ExtractStatus.Ok, r2.error)
    assert(r2.text == "Bare\nbare default part body", r2.text)
  }

  test("eml: multipart QP part preferred, subject first; single-part too") {
    val even = Extract(CorpusGen.emlPayload(52, "body text here"))
    assert(even.contentType == "message/rfc822")
    assert(even.text == "Document 52\nbody text here")
    assert(even.metadata("subject").head == "Document 52")
    val single = Extract(CorpusGen.emlPayload(153, "plain body")) // id/100 odd → single-part
    assert(single.text == "Document 153\nplain body")
  }
  test("eml: QP soft breaks and = escapes decode exactly") {
    val long = ("equation a=b " * 12).trim // forces =3D escapes + soft wraps
    val r = Extract(CorpusGen.emlPayload(52, long))
    assert(r.text == s"Document 52\n$long")
  }
  test("eml: base64 html part used when no text/plain alternative") {
    val b64 = java.util.Base64.getMimeEncoder.encodeToString("<p>only html body</p>".getBytes("UTF-8"))
    val msg = "From: a@b\r\nSubject: S\r\nContent-Type: multipart/alternative; boundary=\"XX\"\r\n\r\n" +
      "--XX\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: base64\r\n\r\n" + b64 + "\r\n--XX--\r\n"
    val r = Extract(msg.getBytes("UTF-8"))
    assert(r.status == ExtractStatus.Ok && r.text == "S\nonly html body")
  }
  test("epub: chapters emit in SPINE order despite reversed zip entry order") {
    val bytes = extractous.gen.EpubWriter.epub("Document 5", Seq("first chapter text"), "Second chapter 5", "T5")
    assert(MimeSniffer.sniff(bytes) == MimeSniffer.Epub)
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == "Document 5\nfirst chapter text\nSecond chapter 5")
    assert(r.metadata("dc:title").head == "T5")
  }
  test("epub: missing container.xml fails the row") {
    val bad = extractous.gen.DocxWriter.zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes("US-ASCII"),
      "OEBPS/ch1.xhtml" -> "<html><body><p>x</p></body></html>".getBytes("UTF-8")),
      Set("mimetype"))
    val r = Extract(bad)
    assert(r.status == ExtractStatus.ExtractionFailed && r.error.contains("container.xml"))
  }

  // ---- charset rungs ----
  test("unlabeled ISO-8859-1 decodes on the cp1252 rung (superset, same bytes)") {
    val payload = (CorpusGen.Latin1Prefix + "plain body").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = Extract(payload)
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == CorpusGen.Latin1Prefix + "plain body")
    assert(r.metadata("Content-Type").head == "text/plain; charset=windows-1252")
  }
  test("unlabeled Shift-JIS detected by byte distribution and decoded") {
    val payload = (CorpusGen.SjisPrefix + "ascii tail").getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    val r = Extract(payload)
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == CorpusGen.SjisPrefix + "ascii tail")
    assert(r.metadata("Content-Type").head == "text/plain; charset=Shift_JIS")
  }
  test("unlabeled GBK detected after SJIS falls through (hanzi leads = katakana singles)") {
    val payload = (CorpusGen.GbkPrefix + "ascii tail").getBytes(java.nio.charset.Charset.forName("GBK"))
    // structurally valid SJIS (all katakana singles) but zero pairs → not SJIS
    assert(!MimeSniffer.looksLikeShiftJis(payload))
    assert(MimeSniffer.looksLikeGbk(payload))
    val r = Extract(payload)
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == CorpusGen.GbkPrefix + "ascii tail")
    assert(r.metadata("Content-Type").head == "text/plain; charset=GBK")
    // and the SJIS doc still classifies SJIS (order dependence, not overlap)
    val sjis = (CorpusGen.SjisPrefix + "t").getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(MimeSniffer.looksLikeShiftJis(sjis))
  }
  test("unlabeled Cyrillic: cp1251 vs KOI8-R by case-band majority (the bands SWAP)") {
    val win = (CorpusGen.CyrPrefix + "ascii tail").getBytes(java.nio.charset.Charset.forName("windows-1251"))
    val koi = (CorpusGen.CyrPrefix + "ascii tail").getBytes(java.nio.charset.Charset.forName("KOI8-R"))
    assert(MimeSniffer.cyrillicCharset(win).contains("windows-1251"))
    assert(MimeSniffer.cyrillicCharset(koi).contains("KOI8-R"))
    val rw = Extract(win)
    assert(rw.status == ExtractStatus.Ok && rw.text == CorpusGen.CyrPrefix + "ascii tail")
    assert(rw.metadata("Content-Type").head == "text/plain; charset=windows-1251")
    val rk = Extract(koi)
    assert(rk.status == ExtractStatus.Ok && rk.text == CorpusGen.CyrPrefix + "ascii tail")
    assert(rk.metadata("Content-Type").head == "text/plain; charset=KOI8-R")
  }
  test("Cyrillic detector declines western accents, CJK, and sparse high bytes") {
    // isolated accents never form letter runs of >= 3
    val latin = (CorpusGen.Latin1Prefix + "tail").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(MimeSniffer.cyrillicCharset(latin).isEmpty)
    // cp1252 prefix carries 0x80/0x96 — outside the letter zones entirely
    val cp = (CorpusGen.Cp1252Prefix + "tail").getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(MimeSniffer.cyrillicCharset(cp).isEmpty)
    // GBK hanzi trails sit below 0xC0
    val gbk = (CorpusGen.GbkPrefix + "tail").getBytes(java.nio.charset.Charset.forName("GBK"))
    assert(MimeSniffer.cyrillicCharset(gbk).isEmpty)
    // and the cp1252 rung is unchanged for latin text end-to-end
    assert(Extract(latin).metadata("Content-Type").head == "text/plain; charset=windows-1252")
  }

  test("SJIS detector: cp1252 text and short accidental pairs never qualify") {
    val cp = (CorpusGen.Cp1252Prefix + "tail").getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(!MimeSniffer.looksLikeShiftJis(cp))
    // the corrupt-kind payload: one accidental pair, stays invalid (-2)
    val corrupt = ("corrupt text document " * 4).getBytes("US-ASCII") ++ Array[Byte](0x81.toByte, 0x8d.toByte)
    assert(!MimeSniffer.looksLikeShiftJis(corrupt))
    assert(Extract(corrupt).status == ExtractStatus.InvalidUtf8)
  }

  test("a member whose decoder THROWS is skipped like any failing member, not the whole row") {
    // truncated gzip: magic + deflate header then EOF — gunzip throws, and the
    // member loop must treat that exactly like a member that returns a status
    val badGz = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 42, 13)
    val bytes = extractous.gen.DocxWriter.zip(Seq(
      "good.txt" -> "survivor text".getBytes("UTF-8"), "bad.gz" -> badGz))
    val r = Extract(bytes)
    assert(r.status == ExtractStatus.Ok, s"${r.status} ${r.error}")
    assert(r.text == "survivor text")
    // and when the throwing member is the ONLY member, the frame is accounted
    val solo = Extract(extractous.gen.DocxWriter.zip(Seq("bad.gz" -> badGz)))
    assert(solo.status == ExtractStatus.ExtractionFailed)
    assert(solo.error.contains("zip member 'bad.gz'"), solo.error)
  }

  test("zstd dictionary frame refuses with -8 (valid but out of scope), not -4") {
    // magic, FHD 0x01 (didSize=1, not single-segment), window descriptor, dict id
    val b = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte, 0x01, 0x00, 0x07)
    val r = Extract(b)
    assert(r.status == ExtractStatus.UnsupportedFormat, s"${r.status} ${r.error}")
    assert(r.error.contains("dictionaries"), r.error)
  }
}
