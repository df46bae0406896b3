package extractous.sniff

/** Magic-byte MIME sniffer — the per-row dispatch predicate of the pipeline
  * (north rule: "sniffs MIME/magic bytes per row"). The reference delegates
  * detection to Tika; this is a from-scratch detector for the formats the north
  * rule names (HTML, PDF, DOCX, scanned images, plain text) plus the generic
  * fallbacks.
  */
object MimeSniffer {
  val Pdf = "application/pdf"
  val Docx = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
  val Xlsx = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
  val Pptx = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
  val Doc = "application/msword"
  val Cfb = "application/x-cfb"
  val Odt = "application/vnd.oasis.opendocument.text"
  val Ods = "application/vnd.oasis.opendocument.spreadsheet"
  val Odp = "application/vnd.oasis.opendocument.presentation"
  val Zip = "application/zip"
  val Tar = "application/x-tar"
  val SevenZ = "application/x-7z-compressed"
  val Rar = "application/vnd.rar"
  val Warc = "application/warc"
  val Iwork = "application/vnd.apple.iwork"
  val Csv = "text/csv"
  val Mbox = "application/mbox"
  val Ics = "text/calendar"
  val Vcf = "text/vcard"
  val Epub = "application/epub+zip"
  val Eml = "message/rfc822"
  val Markdown = "text/markdown"
  val Html = "text/html"
  val Xml = "application/xml"
  val Rtf = "application/rtf"
  val Gzip = "application/gzip"
  val Xz = "application/x-xz"
  val Bzip2 = "application/x-bzip2"
  val Zstd = "application/zstd"
  val Lz4 = "application/x-lz4"
  val Snappy = "application/x-snappy-framed"
  val Plain = "text/plain"
  val Xls = "application/vnd.ms-excel"
  val Ppt = "application/vnd.ms-powerpoint"
  val Bmp = "image/bmp"
  val Png = "image/png"
  val Jpeg = "image/jpeg"
  val Gif = "image/gif"
  val Tiff = "image/tiff"
  val OctetStream = "application/octet-stream"
  val Empty = "application/octet-stream" // empty payload sniffs as generic binary

  private def startsWith(b: Array[Byte], off: Int, sig: String): Boolean = {
    if (b.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if (b(off + i) != sig.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** True iff the whole array is well-formed UTF-8 (the reference maps invalid
    * UTF-8 to a dedicated status, /root/reference/ffi/src/errors.rs:10).
    * Implements the full RFC 3629 table: overlong 3-byte forms (E0 80-9F),
    * UTF-16 surrogates (ED A0-BF), overlong 4-byte forms (F0 80-8F), and
    * codepoints above U+10FFFF (F4 90+) are all rejected — they would
    * otherwise decode to U+FFFD noise instead of the invalid-UTF-8 status.
    */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      val n =
        if (c < 0x80) 0
        else if ((c & 0xe0) == 0xc0) { if (c < 0xc2) return false; 1 }
        else if ((c & 0xf0) == 0xe0) 2
        else if ((c & 0xf8) == 0xf0) { if (c > 0xf4) return false; 3 }
        else return false
      if (i + n >= b.length) return false
      // first continuation byte: range depends on the lead byte (RFC 3629)
      if (n >= 1) {
        val c1 = b(i + 1) & 0xff
        val (lo, hi) = c match {
          case 0xe0 => (0xa0, 0xbf) // reject overlong 3-byte
          case 0xed => (0x80, 0x9f) // reject UTF-16 surrogates
          case 0xf0 => (0x90, 0xbf) // reject overlong 4-byte
          case 0xf4 => (0x80, 0x8f) // reject > U+10FFFF
          case _    => (0x80, 0xbf)
        }
        if (c1 < lo || c1 > hi) return false
      }
      var j = 2
      while (j <= n) {
        if ((b(i + j) & 0xc0) != 0x80) return false
        j += 1
      }
      i += n + 1
    }
    true
  }

  /** Scan zip central/local headers textually for an OOXML marker entry name.
    * Cheap containment scan — full zip walk happens in the office parser.
    */
  private def zipContains(b: Array[Byte], name: String): Boolean =
    zipContains(b, name, b.length)

  private def zipContains(b: Array[Byte], name: String, scanLimit: Int): Boolean = {
    val sig = name.getBytes("US-ASCII")
    var i = 0
    val limit = math.min(scanLimit, b.length) - sig.length
    while (i <= limit) {
      var j = 0
      while (j < sig.length && b(i + j) == sig(j)) j += 1
      if (j == sig.length) return true
      i += 1
    }
    false
  }

  /** Best-effort LOCAL-header name walk, used only when the central
    * directory is unreadable (ZIP64 sentinels: offset 0xFFFFFFFF / count
    * 0xFFFF — a >4 GB or >65535-entry .docx would otherwise sniff as a
    * generic archive and extract as raw member XML, silently wrong text).
    * Local headers lie under streamed zips (bit 3: sizes deferred to data
    * descriptors) — the walk stops at the first such entry; whatever names
    * were collected before that still route OOXML correctly, and declining
    * keeps today's behavior.
    */
  private def zipLocalNames(b: Array[Byte]): Seq[String] = {
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    val out = Seq.newBuilder[String]
    var off = 0
    var n = 0
    while (n < 64 && off + 30 <= b.length &&
        b(off) == 'P' && b(off + 1) == 'K' && b(off + 2) == 3 && b(off + 3) == 4) {
      val flags = u16(off + 6)
      val compSize = u32(off + 18)
      val nameLen = u16(off + 26)
      val extraLen = u16(off + 28)
      if (off + 30 + nameLen > b.length) return out.result()
      out += new String(b, off + 30, nameLen, java.nio.charset.StandardCharsets.UTF_8)
      if ((flags & 0x8) != 0 || compSize == 0xffffffffL) return out.result() // streamed/ZIP64 member: size unknowable here
      val next = off.toLong + 30 + nameLen + extraLen + compSize
      if (next <= off || next > Int.MaxValue) return out.result()
      off = next.toInt
      n += 1
    }
    out.result()
  }

  /** Entry names from the zip CENTRAL directory (EOCD scan from the tail,
    * then PK\x01\x02 walk) — the only reliable name source; local headers
    * lie under streamed zips (data descriptors) and raw-byte scans match
    * member content. An unreadable directory (ZIP64 sentinels) falls back
    * to [[zipLocalNames]]; a malformed one ⇒ empty (the rung declines).
    */
  private def zipEntryNames(b: Array[Byte]): Seq[String] = {
    // EOCD: PK\x05\x06 within the last 64 KB + 22 bytes
    var eocd = -1
    var i = b.length - 22
    val stop = math.max(0, b.length - 22 - 65536)
    while (eocd < 0 && i >= stop) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6) eocd = i
      i -= 1
    }
    if (eocd < 0) return zipLocalNames(b)
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    val count = u16(eocd + 10)
    var off = u32(eocd + 16)
    // ZIP64 sentinels: the real values live in the ZIP64 EOCD — fall back
    // to the local-header walk rather than misrouting the file
    if (count == 0xffff || off == 0xffffffffL) return zipLocalNames(b)
    if (off < 0 || off > b.length - 4) return Seq.empty
    val out = Seq.newBuilder[String]
    var n = 0
    while (n < count && off + 46 <= b.length &&
        b(off.toInt) == 'P' && b(off.toInt + 1) == 'K' && b(off.toInt + 2) == 1 && b(off.toInt + 3) == 2) {
      val o = off.toInt
      val nameLen = u16(o + 28)
      val extraLen = u16(o + 30)
      val commentLen = u16(o + 32)
      if (o + 46 + nameLen > b.length) return out.result()
      out += new String(b, o + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)
      off = o + 46 + nameLen + extraLen + commentLen
      n += 1
    }
    out.result()
  }

  private def looksLikeHtml(b: Array[Byte]): Boolean = {
    // skip UTF-8 BOM + leading whitespace
    var i = 0
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) i = 3
    while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
    if (i >= b.length || b(i) != '<') return false
    val head = extractous.text.Normalize.lowerAscii(
      new String(b, i, math.min(256, b.length - i), java.nio.charset.StandardCharsets.ISO_8859_1))
    if (head.startsWith("<?xml")) return false // generic XML, not HTML
    head.startsWith("<!doctype html") || head.startsWith("<html") ||
      head.startsWith("<head") || head.startsWith("<body") ||
      head.contains("<html") || head.startsWith("<!--") ||
      // any plausible opening tag followed eventually by '>'
      openTagPattern.matcher(head).matches()
  }

  private val openTagPattern = java.util.regex.Pattern.compile("(?s)^<[a-z][a-z0-9]*[ >/].*")

  private def looksLikeXml(b: Array[Byte]): Boolean = {
    var i = 0
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) i = 3
    while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
    startsWith(b, i, "<?xml")
  }

  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return Empty
    if (startsWith(bytes, 0, "%PDF-")) return Pdf
    // OLE2/CFB compound file (.doc/.xls/.ppt shell); the specific application
    // is only knowable from the directory, which is the parser's job
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
        (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0 && (bytes(4) & 0xff) == 0xa1 &&
        (bytes(5) & 0xff) == 0xb1 && (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0xe1) return Cfb
    // ustar TAR: magic at offset 257 — checked before any prefix heuristic
    // because the header BEGINS with the first member's filename, which could
    // otherwise collide with a prefix rung (a member named "BM…", "GIF87a…")
    if (bytes.length >= 262 && (0 until 5).forall(i => bytes(257 + i) == "ustar".charAt(i).toByte))
      return Tar
    if (startsWith(bytes, 0, "PK")) {
      // ODF stores its `mimetype` entry uncompressed first, so the document
      // type is readable as raw bytes right after the local file header
      // the ODF mimetype entry is REQUIRED to be first and STORED, so its
      // value sits inside the first ~128 bytes — never scan the whole payload
      // ODF/EPUB store their mimetype entry STORED and FIRST by spec, so the
      // type is readable in the first ~128 raw bytes — keep the cheap scan
      if (zipContains(bytes, Odt, 256)) return Odt
      if (zipContains(bytes, Ods, 256)) return Ods
      if (zipContains(bytes, Odp, 256)) return Odp
      if (zipContains(bytes, Epub, 256)) return Epub // EPUB stores mimetype first, like ODF
      // Everything else keys on the central directory's REAL entry names — a
      // raw-byte scan would false-positive on any archive whose member
      // CONTENT merely mentions "word/"/"index.xml" (and misroute it away
      // from archive recursion). One EOCD walk serves all rungs.
      val names = zipEntryNames(bytes)
      if (names.exists(_.startsWith("word/"))) return Docx
      if (names.exists(_.startsWith("xl/"))) return Xlsx
      if (names.exists(_.startsWith("ppt/"))) return Pptx
      // iWork '09 package: index.xml + QuickLook/ together (either alone is
      // too generic); the application (Pages/Numbers/Keynote) is only
      // knowable from index.xml's root, which is the parser's job
      if (names.contains("index.xml") && names.exists(_.startsWith("QuickLook/"))) return Iwork
      return Zip
    }
    if (startsWith(bytes, 0, "{\\rtf")) return Rtf
    if (extractous.core.SevenZip.looksLike7z(bytes)) return SevenZ
    if (extractous.core.SevenZip.looksLikeRar(bytes)) return Rar
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) return Gzip
    if (extractous.core.Xz.looksLikeXz(bytes)) return Xz
    if (extractous.core.Bzip2.looksLikeBzip2(bytes)) return Bzip2
    if (extractous.core.Zstd.looksLikeZstd(bytes)) return Zstd
    if (extractous.core.Lz4.looksLikeLz4(bytes)) return Lz4
    if (extractous.core.Snappy.looksLikeFramedSnappy(bytes)) return Snappy
    if (startsWith(bytes, 0, "BM")) return Bmp
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && startsWith(bytes, 1, "PNG")) return Png
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) return Jpeg
    if (startsWith(bytes, 0, "GIF87a") || startsWith(bytes, 0, "GIF89a")) return Gif
    // WARC (ISO 28500): every file begins with its first record's version line
    if (startsWith(bytes, 0, "WARC/1.")) return Warc
    if (bytes.length >= 4 && ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
        (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42))) return Tiff
    // UTF-16 byte-order marks: textual payload in a non-UTF-8 encoding
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe) return Plain
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff) return Plain
    if (looksLikeXml(bytes)) return Xml
    if (looksLikeHtml(bytes)) return Html
    if (startsWith(bytes, 0, "BEGIN:VCALENDAR")) return Ics
    if (startsWith(bytes, 0, "BEGIN:VCARD")) return Vcf
    if (extractous.mail.MboxExtractor.looksLikeMbox(bytes)) return Mbox
    if (looksLikeEmail(bytes)) return Eml
    if (looksLikeMarkdown(bytes)) return Markdown
    if (isValidUtf8(bytes)) {
      // delimited-text subtype of plain (Tika's TextAndCSVParser shape):
      // uniform out-of-quote delimiter count across sampled lines. Decode
      // only when a delimiter byte exists at all — ASCII bytes never occur
      // inside UTF-8 multibyte sequences, so the byte scan is exact, and a
      // delimiter-free text can never pass the uniform-count test.
      var hasDelim = false
      var di = 0
      while (!hasDelim && di < bytes.length) {
        val b = bytes(di)
        if (b == '\t' || b == ',' || b == ';') hasDelim = true
        di += 1
      }
      if (hasDelim) {
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        if (extractous.mail.CsvExtractor.looksLikeDelimited(s)) return Csv
      }
      return Plain
    }
    if (looksLikeShiftJis(bytes)) return Plain
    // Cyrillic before GBK, mirroring the decode ladder in Extract.plain
    // (here both rungs yield Plain, so order only matters for readability)
    if (cyrillicCharset(bytes).isDefined) return Plain
    if (looksLikeGbk(bytes)) return Plain
    if (looksLikeCp1252Text(bytes)) return Plain
    OctetStream
  }

  /** Cyrillic single-byte text: windows-1251 vs KOI8-R (the Russian-web
    * rungs — unlabeled Cyrillic would otherwise mojibake through the cp1252
    * superset rung). Shape test: every high byte must be a Cyrillic letter
    * zone byte (0xC0–0xFF in both encodings, plus cp1251's Ё/ё at
    * 0xA8/0xB8), at least 8 of them, clustering into letter runs of ≥ 3
    * (words — isolated accents in western text never cluster). The two
    * encodings SWAP their case bands (cp1251 lowercase = 0xE0–0xFF, KOI8-R
    * lowercase = 0xC0–0xDF), so lowercase-dominant prose decides by band
    * majority — the same trick ICU's detector uses. KOI8-R's ё at 0xA3 is
    * outside the accepted set: text carrying it falls through to cp1252
    * (documented miss, preferable to loosening the gate).
    */
  def cyrillicCharset(bytes: Array[Byte]): Option[String] = {
    var lowKoi = 0 // 0xC0-0xDF: KOI8-R lowercase / cp1251 uppercase
    var lowWin = 0 // 0xE0-0xFF: cp1251 lowercase / KOI8-R uppercase
    var high = 0
    var run = 0
    var maxRun = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 0x80) {
        if (b >= 0xc0 && b <= 0xdf) { lowKoi += 1; high += 1 }
        else if (b >= 0xe0) { lowWin += 1; high += 1 }
        else if (b == 0xa8 || b == 0xb8) high += 1 // cp1251 Ё/ё
        else return None
        run += 1
        if (run > maxRun) maxRun = run
      } else run = 0
      i += 1
    }
    if (high < 8 || maxRun < 3) None
    else Some(if (lowWin >= lowKoi) "windows-1251" else "KOI8-R")
  }

  /** RFC-822 message: starts with a canonical trace/origin header AND carries
    * a Subject header in the first KB — strict enough that prose never
    * qualifies (prose does not start with "From: "/"Received: ").
    */
  def looksLikeEmail(bytes: Array[Byte]): Boolean = {
    val head = new String(bytes, 0, math.min(1024, bytes.length), java.nio.charset.StandardCharsets.ISO_8859_1)
    val starts = Seq("From: ", "Return-Path: ", "Received: ", "Message-ID: ")
    starts.exists(head.startsWith) &&
      (head.startsWith("Subject: ") || head.contains("\nSubject: ") || head.contains("\r\nSubject: "))
  }

  /** Markdown: begins with an ATX heading ("# "), the shape every generated
    * or hand-written document leads with. Deliberately narrow — ambiguous
    * list-only fragments stay text/plain, which extracts identically.
    */
  def looksLikeMarkdown(bytes: Array[Byte]): Boolean = {
    var i = 0
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) i = 3
    while (i < bytes.length && (bytes(i) == '\n' || bytes(i) == '\r')) i += 1
    i + 1 < bytes.length && bytes(i) == '#' && (bytes(i + 1) == ' ' || bytes(i + 1) == '#')
  }

  /** Unlabeled Shift-JIS by byte distribution (the CJK rung of the charset
    * ladder): every byte must fit SJIS structure — ASCII, single-byte katakana
    * (0xA1-0xDF), or a lead byte (0x81-0x9F / 0xE0-0xEF) followed by a valid
    * trail (0x40-0x7E / 0x80-0xFC) — AND at least 4 double-byte pairs must be
    * present. The pair minimum keeps short accidental matches (e.g. a stray
    * 0x81 0x8D in an otherwise-ASCII corrupt payload) classified as invalid
    * rather than silently decoded as one kanji; real Japanese text has runs
    * of pairs. cp1252 text never qualifies: isolated accents are followed by
    * ASCII below 0x40.
    */
  def looksLikeShiftJis(bytes: Array[Byte]): Boolean = {
    var pairs = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80 || (b >= 0xa1 && b <= 0xdf)) i += 1
      else if ((b >= 0x81 && b <= 0x9f) || (b >= 0xe0 && b <= 0xef)) {
        if (i + 1 >= bytes.length) return false
        val t = bytes(i + 1) & 0xff
        if ((t >= 0x40 && t <= 0x7e) || (t >= 0x80 && t <= 0xfc)) { pairs += 1; i += 2 }
        else return false
      } else return false
    }
    pairs >= 4
  }

  /** Unlabeled GBK, checked AFTER Shift-JIS: every high byte must open a
    * valid GBK pair (lead 0x81-0xFE, trail 0x40-0xFE except 0x7F) and ≥ 4
    * pairs must be present. Order matters and disambiguates: Japanese SJIS
    * text passes the SJIS structural check first; Chinese GBK text falls
    * THROUGH it because common hanzi leads (0xB0-0xF7) sit in SJIS's
    * single-byte katakana range (0xA1-0xDF) or its invalid-lead range
    * (0xF0+), leaving SJIS with < 4 pairs. cp1252 never qualifies (isolated
    * accents are followed by ASCII below 0x40); the corrupt 0x81,0x8D
    * payload has 1 pair and stays invalid-UTF-8.
    */
  def looksLikeGbk(bytes: Array[Byte]): Boolean = {
    var pairs = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) i += 1
      else if (b >= 0x81 && b <= 0xfe) {
        if (i + 1 >= bytes.length) return false
        val t = bytes(i + 1) & 0xff
        if (t >= 0x40 && t <= 0xfe && t != 0x7f) { pairs += 1; i += 2 }
        else return false
      } else return false
    }
    pairs >= 4
  }

  /** Clean single-byte text: ≥ 97% textual bytes, at least one high byte, and
    * no byte undefined in windows-1252 (0x81/8D/8F/90/9D) — the charset-
    * detection rung that rescues Latin-1/cp1252 crawl text from a blanket
    * invalid-UTF-8 rejection.
    */
  def looksLikeCp1252Text(bytes: Array[Byte]): Boolean = {
    if (bytes.isEmpty) return false
    var textual = 0
    var high = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if ((b >= 0x20 && b < 0x7f) || b == '\n' || b == '\r' || b == '\t') textual += 1
      else if (b >= 0x80) {
        if (b == 0x81 || b == 0x8d || b == 0x8f || b == 0x90 || b == 0x9d) return false
        high += 1; textual += 1
      }
      i += 1
    }
    high > 0 && textual.toDouble / bytes.length >= 0.97
  }
}
