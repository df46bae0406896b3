package extractous.gen

import java.io.ByteArrayOutputStream

/** From-scratch LZMA1 encoder (range coder + greedy matcher), written from
  * the published LZMA specification and DELIBERATELY independent of the
  * decoder in `extractous.core.Lzma` — fixture round-trips are a genuine
  * two-implementation oracle of the probability-model and range-coder
  * arithmetic (same pattern as `PdfEncWriter` vs `PdfCrypt`).
  *
  * The greedy matcher emits new matches, all four repeated-distance forms,
  * and short-reps, so fixture streams exercise every decoder branch.
  * Output: a raw LZMA1 stream (no end marker — 7z folders carry sizes in
  * the container), or an LZMA2 chunk wrapper.
  */
object LzmaWriter {

  private final val TopValue = 1L << 24
  private final val ProbInit: Short = 1024

  /** Encode with the classic defaults; returns (props5, packed). */
  def encode(data: Array[Byte], lc: Int = 3, lp: Int = 0, pb: Int = 2): (Array[Byte], Array[Byte]) = {
    val enc = new Enc(lc, lp, pb)
    val packed = enc.encodeAll(data)
    val propsByte = (pb * 5 + lp) * 9 + lc
    val dictSize = 1 << 16
    val props = Array[Byte](propsByte.toByte,
      (dictSize & 0xff).toByte, ((dictSize >> 8) & 0xff).toByte,
      ((dictSize >> 16) & 0xff).toByte, ((dictSize >> 24) & 0xff).toByte)
    (props, packed)
  }

  /** Wrap data as an LZMA2 stream: one compressed chunk with a full reset
    * (control 0xE0|sizeHigh, new props), or a single uncompressed chunk for
    * inputs the matcher can't shrink. Chunk size limits (2^21 unpack /
    * 2^16 pack) force splitting for larger fixtures.
    */
  def encodeLzma2(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var off = 0
    var first = true
    while (off < data.length || (first && data.isEmpty)) {
      // 64 KiB chunks: the uncompressed-chunk size field is 16-bit, and the
      // compressed pack-size field too, so this bound keeps both arms legal
      val take = math.min(data.length - off, 1 << 16)
      val chunk = java.util.Arrays.copyOfRange(data, off, off + take)
      val (props, packed) = encode(chunk)
      if (take > 0 && packed.length <= 0xffff + 1 && packed.length < take + 64) {
        // compressed chunk, full reset each chunk (state independence keeps
        // the writer simple; the decoder handles both)
        val control = 0x80 | (3 << 5) | ((take - 1) >> 16)
        out.write(control)
        out.write(((take - 1) >> 8) & 0xff); out.write((take - 1) & 0xff)
        out.write(((packed.length - 1) >> 8) & 0xff); out.write((packed.length - 1) & 0xff)
        out.write(props(0) & 0xff)
        out.write(packed)
      } else if (take > 0) {
        // uncompressed chunk (dict reset on first)
        out.write(if (first) 0x01 else 0x02)
        out.write(((take - 1) >> 8) & 0xff); out.write((take - 1) & 0xff)
        out.write(chunk)
      }
      off += take
      first = false
    }
    out.write(0x00)
    out.toByteArray
  }

  private final class Enc(lc: Int, lp: Int, pb: Int) {
    private val out = new ByteArrayOutputStream()
    private var low = 0L
    private var range = 0xffffffffL
    private var cache = 0
    private var cacheSize = 1L

    private val litProbs = Array.fill[Short](0x300 << (lc + lp))(ProbInit)
    private val isMatch = Array.fill[Short](12 << 4)(ProbInit)
    private val isRep = Array.fill[Short](12)(ProbInit)
    private val isRepG0 = Array.fill[Short](12)(ProbInit)
    private val isRepG1 = Array.fill[Short](12)(ProbInit)
    private val isRepG2 = Array.fill[Short](12)(ProbInit)
    private val isRep0Long = Array.fill[Short](12 << 4)(ProbInit)
    private val posSlot = Array.fill(4)(Array.fill[Short](64)(ProbInit))
    private val specPos = Array.fill[Short](115)(ProbInit)
    private val align = Array.fill[Short](16)(ProbInit)
    private val lenLow = Array.fill(16)(Array.fill[Short](8)(ProbInit))
    private val lenMid = Array.fill(16)(Array.fill[Short](8)(ProbInit))
    private val lenHigh = Array.fill[Short](256)(ProbInit)
    private val lenChoice = Array.fill[Short](2)(ProbInit)
    private val repLenLow = Array.fill(16)(Array.fill[Short](8)(ProbInit))
    private val repLenMid = Array.fill(16)(Array.fill[Short](8)(ProbInit))
    private val repLenHigh = Array.fill[Short](256)(ProbInit)
    private val repLenChoice = Array.fill[Short](2)(ProbInit)

    private var state = 0
    private var rep0 = 0
    private var rep1 = 0
    private var rep2 = 0
    private var rep3 = 0

    private def shiftLow(): Unit = {
      if ((low & 0xffffffffL) < 0xff000000L || low > 0xffffffffL) {
        var c = cache
        var continue = true
        while (continue) {
          out.write(((c + (low >>> 32)) & 0xff).toInt)
          c = 0xff
          cacheSize -= 1
          continue = cacheSize != 0
        }
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low << 8) & 0xffffffffL
    }

    private def encodeBit(probs: Array[Short], i: Int, bit: Int): Unit = {
      val p = probs(i) & 0xffff
      val bound = (range >>> 11) * p
      if (bit == 0) {
        range = bound
        probs(i) = (p + ((2048 - p) >> 5)).toShort
      } else {
        low += bound
        range -= bound
        probs(i) = (p - (p >> 5)).toShort
      }
      while (range < TopValue) { range <<= 8; shiftLow() }
    }

    private def encodeDirect(v: Int, count: Int): Unit = {
      var i = count - 1
      while (i >= 0) {
        range >>>= 1
        if (((v >>> i) & 1) == 1) low += range
        while (range < TopValue) { range <<= 8; shiftLow() }
        i -= 1
      }
    }

    private def bitTreeEncode(probs: Array[Short], numBits: Int, sym: Int): Unit = {
      var m = 1
      var i = numBits - 1
      while (i >= 0) {
        val bit = (sym >>> i) & 1
        encodeBit(probs, m, bit)
        m = (m << 1) | bit
        i -= 1
      }
    }

    private def reverseEncode(probs: Array[Short], base: Int, numBits: Int, sym: Int): Unit = {
      var m = 1
      var i = 0
      while (i < numBits) {
        val bit = (sym >>> i) & 1
        encodeBit(probs, base + m, bit)
        m = (m << 1) | bit
        i += 1
      }
    }

    private def encodeLen(rep: Boolean, posState: Int, len0: Int): Unit = {
      val (lowP, midP, highP, choice) =
        if (rep) (repLenLow, repLenMid, repLenHigh, repLenChoice)
        else (lenLow, lenMid, lenHigh, lenChoice)
      if (len0 < 8) { encodeBit(choice, 0, 0); bitTreeEncode(lowP(posState), 3, len0) }
      else if (len0 < 16) { encodeBit(choice, 0, 1); encodeBit(choice, 1, 0); bitTreeEncode(midP(posState), 3, len0 - 8) }
      else { encodeBit(choice, 0, 1); encodeBit(choice, 1, 1); bitTreeEncode(highP, 8, len0 - 16) }
    }

    private def encodeLiteral(data: Array[Byte], pos: Int, posState: Int): Unit = {
      encodeBit(isMatch, (state << 4) + posState, 0)
      val prevByte = if (pos == 0) 0 else data(pos - 1) & 0xff
      val litState = ((pos & ((1 << lp) - 1)) << lc) + (prevByte >>> (8 - lc))
      val base = 0x300 * litState
      val sym = data(pos) & 0xff
      if (state < 7) {
        var m = 1
        var i = 7
        while (i >= 0) {
          val bit = (sym >>> i) & 1
          encodeBit(litProbs, base + m, bit)
          m = (m << 1) | bit
          i -= 1
        }
      } else {
        var matchByte = data(pos - rep0 - 1) & 0xff
        var m = 1
        var i = 7
        var matched = true
        while (i >= 0) {
          val bit = (sym >>> i) & 1
          if (matched) {
            val matchBit = (matchByte >> 7) & 1
            matchByte = (matchByte << 1) & 0xff
            encodeBit(litProbs, base + ((1 + matchBit) << 8) + m, bit)
            if (matchBit != bit) matched = false
          } else encodeBit(litProbs, base + m, bit)
          m = (m << 1) | bit
          i -= 1
        }
      }
      state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
    }

    // 3-byte hash-chain match finder (bounded chain walk — linear-time
    // encoding even on incompressible input, unlike a brute window scan)
    private val hashHead = Array.fill(1 << 16)(-1)
    private var hashPrev: Array[Int] = _

    private def hash3(data: Array[Byte], p: Int): Int =
      (((data(p) & 0xff) * 506832829) + ((data(p + 1) & 0xff) * 65599) + (data(p + 2) & 0xff)) & 0xffff

    private def insertPos(data: Array[Byte], p: Int): Unit =
      if (p + 2 < data.length) {
        val h = hash3(data, p)
        hashPrev(p) = hashHead(h)
        hashHead(h) = p
      }

    private def matchLenAt(data: Array[Byte], pos: Int, dist: Int, maxLen: Int): Int = {
      if (dist + 1 > pos) return 0
      val src = pos - dist - 1
      var l = 0
      while (l < maxLen && data(pos + l) == data(src + l)) l += 1
      l
    }

    /** Longest ≥3 match at pos via the hash chain. Returns (len, repValue)
      * with repValue = distance − 1, or (0, 0).
      */
    private def findMatch(data: Array[Byte], pos: Int): (Int, Int) = {
      val maxLen = math.min(273, data.length - pos)
      if (maxLen < 3 || pos + 2 >= data.length) return (0, 0)
      var bestLen = 0
      var bestDist = 0
      var cand = hashHead(hash3(data, pos))
      var steps = 0
      while (cand >= 0 && pos - cand <= (1 << 15) && steps < 64) {
        val d = pos - cand
        val l = matchLenAt(data, pos, d - 1, maxLen)
        if (l > bestLen) { bestLen = l; bestDist = d }
        cand = hashPrev(cand)
        steps += 1
      }
      if (bestLen < 3) (0, 0) else (bestLen, bestDist - 1)
    }

    def encodeAll(data: Array[Byte]): Array[Byte] = {
      val pbMask = (1 << pb) - 1
      hashPrev = new Array[Int](math.max(1, data.length))
      var pos = 0
      while (pos < data.length) {
        val posState = pos & pbMask
        val maxLen = math.min(273, data.length - pos)
        val (newLen, newDist) = findMatch(data, pos)
        // repeated-distance candidates checked explicitly (the hash chain
        // only surfaces ≥3 matches; reps are cheap to encode down to len 2)
        var repIdx = -1
        var repLen = 0
        if (pos > 0) {
          var k = 0
          while (k < 4) {
            val d = k match { case 0 => rep0; case 1 => rep1; case 2 => rep2; case _ => rep3 }
            val l = matchLenAt(data, pos, d, maxLen)
            if (l > repLen) { repLen = l; repIdx = k }
            k += 1
          }
        }
        // prefer a rep when it is nearly as long as the best new match
        val useRep = repLen >= 2 && (repLen + 1 >= newLen || newLen < 3)
        var adv = 1
        val (len, dist) = if (useRep) {
          (repLen, repIdx match { case 0 => rep0; case 1 => rep1; case 2 => rep2; case _ => rep3 })
        } else (newLen, newDist)
        if (useRep) {
          // repeated-distance match
          encodeBit(isMatch, (state << 4) + posState, 1)
          encodeBit(isRep, state, 1)
          repIdx match {
            case 0 =>
              encodeBit(isRepG0, state, 0)
              encodeBit(isRep0Long, (state << 4) + posState, 1)
            case 1 =>
              encodeBit(isRepG0, state, 1)
              encodeBit(isRepG1, state, 0)
              rep1 = rep0; rep0 = dist
            case 2 =>
              encodeBit(isRepG0, state, 1)
              encodeBit(isRepG1, state, 1)
              encodeBit(isRepG2, state, 0)
              rep2 = rep1; rep1 = rep0; rep0 = dist
            case _ =>
              encodeBit(isRepG0, state, 1)
              encodeBit(isRepG1, state, 1)
              encodeBit(isRepG2, state, 1)
              rep3 = rep2; rep2 = rep1; rep1 = rep0; rep0 = dist
          }
          encodeLen(rep = true, posState, len - 2)
          state = if (state < 7) 8 else 11
          adv = len
        } else if (len >= 3) {
          // new match
          encodeBit(isMatch, (state << 4) + posState, 1)
          encodeBit(isRep, state, 0)
          rep3 = rep2; rep2 = rep1; rep1 = rep0; rep0 = dist
          val len0 = len - 2
          encodeLen(rep = false, posState, len0)
          val lenToPosState = math.min(len0, 3)
          val slot =
            if (dist < 4) dist
            else {
              val n = 31 - Integer.numberOfLeadingZeros(dist)
              (n << 1) | ((dist >>> (n - 1)) & 1)
            }
          bitTreeEncode(posSlot(lenToPosState), 6, slot)
          if (slot >= 4) {
            val numDirect = (slot >> 1) - 1
            val baseVal = (2 | (slot & 1)) << numDirect
            val footer = dist - baseVal
            if (slot < 14) reverseEncode(specPos, baseVal - slot - 1, numDirect, footer)
            else {
              encodeDirect(footer >>> 4, numDirect - 4)
              reverseEncode(align, 0, 4, footer & 0xf)
            }
          }
          state = if (state < 7) 7 else 10
          adv = len
        } else if (pos > 0 && rep0 + 1 <= pos && data(pos) == data(pos - rep0 - 1)) {
          // short rep (single byte at rep0)
          encodeBit(isMatch, (state << 4) + posState, 1)
          encodeBit(isRep, state, 1)
          encodeBit(isRepG0, state, 0)
          encodeBit(isRep0Long, (state << 4) + posState, 0)
          state = if (state < 7) 9 else 11
        } else {
          encodeLiteral(data, pos, posState)
        }
        var j = 0
        while (j < adv) { insertPos(data, pos + j); j += 1 }
        pos += adv
      }
      var i = 0
      while (i < 5) { shiftLow(); i += 1 }
      out.toByteArray
    }
  }
}
