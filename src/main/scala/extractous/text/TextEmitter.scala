package extractous.text

import extractous.config.CharSet

/** The single canonical whitespace/block policy shared by ALL format parsers
  * (SURVEY.md §7.4: one policy, frozen by golden files):
  *   - a document is a sequence of blocks (paragraph, heading, table row, line);
  *   - within a block, whitespace runs collapse to a single space and the block
  *    is trimmed;
  *   - empty blocks are dropped;
  *   - blocks are joined with a single '\n'; no trailing newline.
  */
object Normalize {
  /** Collapse internal whitespace runs to one space and trim.
    *
    * Fast path: a string already in canonical form (no leading/trailing
    * whitespace, every whitespace char a single ' ') is returned as-is —
    * the extraction hot path normalizes each block at least twice (the
    * parser's flush and the emitter's defensive re-normalize), and the
    * second pass would otherwise copy the full document again.
    */
  def line(s: String): String = {
    var i = 0
    var prevSpace = true // true at index 0 ⇒ a leading ' ' needs the slow path
    while (i < s.length) {
      val c = s.charAt(i)
      // ASCII printable (the overwhelmingly common case) is never whitespace
      if (c > ' ' && c < 127) prevSpace = false
      else if (c == ' ') {
        if (prevSpace) return lineSlow(s)
        prevSpace = true
      } else if (Character.isWhitespace(c)) return lineSlow(s)
      else prevSpace = false
      i += 1
    }
    if (prevSpace && s.nonEmpty) lineSlow(s) else s
  }


  private def lineSlow(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c); started = true
      }
      i += 1
    }
    sb.toString
  }

  /** Canonical form of multi-line raw text: normalize each line, drop empties,
    * join with '\n'.
    */
  def text(s: String): String =
    s.split("\n", -1).iterator.map(line).filter(_.nonEmpty).mkString("\n")

  /** ASCII-only lowercase: locale-independent and length-preserving.
    * `String.toLowerCase()` uses the JVM default locale ("TITLE" → "tıtle"
    * under tr_TR, silently breaking every ASCII-keyword comparison on such
    * executors) and can change string LENGTH for some Unicode points
    * (U+0130 → "i" + combining dot), which would desynchronize a lowercased
    * shadow copy from the original's indices. Every parser here compares
    * against ASCII keywords (tag names, header names, MIME tokens), so the
    * ASCII map is both the correct semantics and the fast path.
    */
  def lowerAscii(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) return s
    val b = new Array[Char](s.length)
    s.getChars(0, s.length, b, 0)
    while (i < b.length) {
      val c = b(i)
      if (c >= 'A' && c <= 'Z') b(i) = (c + 32).toChar
      i += 1
    }
    new String(b)
  }

  /** ASCII-only uppercase twin of [[lowerAscii]]. */
  def upperAscii(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'a' && s.charAt(i) <= 'z')) i += 1
    if (i == s.length) return s
    val b = new Array[Char](s.length)
    s.getChars(0, s.length, b, 0)
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') b(i) = (c - 32).toChar
      i += 1
    }
    new String(b)
  }
}

/** Accumulates blocks under the canonical policy with early truncation at
  * `maxLen` characters — the reference's extract-string-max-length applied
  * during emission, not post-hoc (/root/reference/extractor.go:144-151).
  * Parsers should stop feeding once `isFull`.
  */
final class TextEmitter(maxLen: Int) {
  // blocks are accumulated by REFERENCE and joined once in result(): the
  // StringBuilder formulation copied every block's chars twice (append +
  // toString), which at web-page sizes was the emitter's whole cost. `len`
  // tracks exactly what the builder's length() used to be (blocks +
  // '\n' separators), so the truncation arithmetic is unchanged.
  private val parts = new java.util.ArrayList[String]()
  private var len = 0
  private var full = false

  def isFull: Boolean = full

  /** Add one block (normalized internally). Returns false once the limit is hit. */
  def addBlock(raw: String): Boolean = {
    if (full) return false
    appendNormalized(Normalize.line(raw))
  }

  /** Add a block the CALLER guarantees is already in [[Normalize.line]]
    * canonical form (e.g. the HTML extractor's blocks, normalized at flush) —
    * skips the defensive re-normalize scan. Passing a non-canonical string
    * here would corrupt the one-policy output; only use where the invariant
    * is structural.
    */
  def addNormalizedBlock(t: String): Boolean = {
    if (full) return false
    appendNormalized(t)
  }

  private def appendNormalized(t: String): Boolean = {
    if (t.nonEmpty) {
      val sep = if (len > 0) 1 else 0
      if (len + sep + t.length > maxLen) {
        var room = maxLen - len - sep
        // never cut between the halves of a surrogate pair: a dangling high
        // surrogate would turn into U+FFFD/'?' at every downstream UTF-8
        // encode (parquet write, stream getBytes), corrupting the output and
        // desynchronizing byte-count columns from the closed-form oracles
        if (room > 0 && room < t.length && Character.isHighSurrogate(t.charAt(room - 1))) room -= 1
        // a room <= 0 cut would have stranded the separator: the builder
        // path stripped a trailing '\n' — here the separator is implicit,
        // so simply don't add the block
        if (room > 0) {
          parts.add(t.substring(0, room))
          len += sep + room
        }
        full = true
      } else {
        parts.add(t)
        len += sep + t.length
      }
    }
    !full
  }

  def result(): String = {
    val n = parts.size
    if (n == 0) ""
    else if (n == 1) parts.get(0)
    else {
      val out = new java.lang.StringBuilder(len)
      var i = 0
      while (i < n) {
        if (i > 0) out.append('\n')
        out.append(parts.get(i))
        i += 1
      }
      out.toString
    }
  }
}

/** Structured-XML-mode emitter (reference SetXmlOutput,
  * /root/reference/extractor.go:299-305; XML mode preserves paragraphs/headings,
  * /root/reference/config.go:186-192). Deterministic minimal XHTML-like format:
  * `<doc>` root, `<title>`, `<h1>`..`<h6>`, `<p>`, one element per block,
  * separated by '\n'.
  */
final class XmlEmitter(maxLen: Int, enabled: Boolean = true) {
  private val sb = new java.lang.StringBuilder("<doc>")
  private var full = false

  def isFull: Boolean = full

  def escape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case c   => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  def addElement(tag: String, raw: String): Unit = {
    // disabled emitters (xmlOutput=false callers) skip the normalize/escape/
    // append work entirely — the result is discarded, so assembling it was
    // pure per-document overhead on the flagship path
    if (full || !enabled) return
    var t = Normalize.line(raw)
    if (t.nonEmpty) {
      // enforce the cap DURING emission, like TextEmitter.addBlock: a single
      // oversized block (e.g. a paragraph inflated from a 256 MB-capped
      // decompression) must not be appended whole before the cap is checked,
      // or the xml column is unbounded exactly when the bound matters.
      // Elements that fit are appended whole; the element that crosses the
      // cap is truncated at the remaining text budget (surrogate-safe) and
      // still closed, so the output stays well-formed.
      val room = maxLen - sb.length()
      if (t.length > room) {
        var cut = math.max(room, 0)
        if (cut > 0 && cut < t.length && Character.isHighSurrogate(t.charAt(cut - 1))) cut -= 1
        t = t.substring(0, cut)
        full = true
      }
      if (t.nonEmpty)
        sb.append('\n').append('<').append(tag).append('>')
          .append(escape(t)).append("</").append(tag).append('>')
      if (sb.length() >= maxLen) full = true
    }
  }

  def result(): String = sb.append("\n</doc>").toString
}

object Encoding {
  /** Apply the configured output charset. In a String-column world this is a
    * lossy fold for non-representable characters (US-ASCII → '?'), a no-op for
    * UTF-8/UTF-16BE round trips — semantics of the reference's SetEncoding
    * (/root/reference/extractor.go:186-190) without its byte-level surface.
    */
  def apply(s: String, cs: CharSet): String = cs match {
    case CharSet.Utf8 => s
    case other =>
      val charset = java.nio.charset.Charset.forName(other.charsetName)
      new String(s.getBytes(charset), charset)
  }
}
