package extractous.gen

import scala.collection.mutable.ArrayBuffer

/** .bz2 writer for fixture generation — a real, from-scratch bzip2
  * compressor (RLE1 → BWT via prefix-doubling rotation sort → MTF+RLE2 →
  * canonical Huffman over two groups), independent of the reader in
  * [[extractous.core.Bzip2]] so round-trips are a genuine
  * two-implementation oracle of the stream format. Multi-block output is
  * exercised by compressing above the level's 100k·level block budget.
  */
object BzipWriter {

  /** MSB-first bit emitter; blocks concatenate at bit granularity. */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def result(): Array[Byte] = {
      if (nb > 0) { out.write(cur << (8 - nb)); cur = 0; nb = 0 }
      out.toByteArray
    }
  }

  /** BWT of the cyclic rotations of `s`: prefix-doubling over rotation
    * ranks (keys packed into one long: 20-bit ranks + 20-bit index, so
    * blocks up to the format's 900k limit sort as primitive longs).
    * Returns (last column, index of the original rotation).
    */
  private def bwt(s: Array[Byte]): (Array[Byte], Int) = {
    val n = s.length
    if (n == 1) return (s.clone(), 0)
    require(n < (1 << 20), "bzip2 writer: block too large")
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s(i) & 0xff; i += 1 }
    val keys = new Array[Long](n)
    var k = 1
    var done = false
    while (!done) {
      i = 0
      while (i < n) {
        val r2 = rank((i + k) % n)
        keys(i) = (rank(i).toLong << 40) | (r2.toLong << 20) | i
        i += 1
      }
      java.util.Arrays.sort(keys)
      val next = new Array[Int](n)
      var r = 0
      next((keys(0) & 0xfffff).toInt) = 0
      i = 1
      while (i < n) {
        if ((keys(i) >>> 20) != (keys(i - 1) >>> 20)) r += 1
        next((keys(i) & 0xfffff).toInt) = r
        i += 1
      }
      rank = next
      // ranks fully separate, OR the compared span covers the whole block:
      // any still-tied rotations are genuinely identical (periodic input),
      // identical matrix rows sort interchangeably, and the key's index low
      // bits break the tie consistently — reconstruction from any of the
      // tied rows differs only by a full period, i.e. not at all
      done = r == n - 1 || k >= n
      k <<= 1
    }
    val last = new Array[Byte](n)
    var orig = 0
    i = 0
    while (i < n) {
      val p = (keys(i) & 0xfffff).toInt
      last(i) = s((p + n - 1) % n)
      if (p == 0) orig = i
      i += 1
    }
    (last, orig)
  }

  /** Huffman code lengths capped at `cap`, with bzip2's flatten-and-retry
    * when the tree runs too deep.
    */
  private def huffLengths(freqIn: Array[Int], cap: Int): Array[Int] = {
    val n = freqIn.length
    var freq = freqIn.map(f => math.max(1, f).toLong)
    while (true) {
      val weight = new Array[Long](2 * n)
      val parent = new Array[Int](2 * n)
      val alive = ArrayBuffer.tabulate(n)(identity)
      System.arraycopy(freq, 0, weight, 0, n)
      var nextNode = n
      while (alive.length > 1) {
        var a = 0; var b = 1
        if (weight(alive(b)) < weight(alive(a))) { a = 1; b = 0 }
        var j = 2
        while (j < alive.length) {
          if (weight(alive(j)) < weight(alive(a))) { b = a; a = j }
          else if (weight(alive(j)) < weight(alive(b))) b = j
          j += 1
        }
        val na = alive(a); val nb = alive(b)
        weight(nextNode) = weight(na) + weight(nb)
        parent(na) = nextNode; parent(nb) = nextNode
        val (hi, lo) = if (a > b) (a, b) else (b, a)
        alive.remove(hi); alive.remove(lo)
        alive += nextNode
        nextNode += 1
      }
      val root = alive(0)
      val lens = new Array[Int](n)
      var maxLen = 0
      var s = 0
      while (s < n) {
        var d = 0
        var p = s
        while (p != root) { p = parent(p); d += 1 }
        lens(s) = math.max(d, 1)
        if (lens(s) > maxLen) maxLen = lens(s)
        s += 1
      }
      if (maxLen <= cap) return lens
      freq = freq.map(f => 1 + f / 2)
    }
    sys.error("unreachable")
  }

  /** Canonical codes in bzip2's assignment order (length-major, symbol-minor). */
  private def assignCodes(lens: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lens.length)
    val minLen = lens.min; val maxLen = lens.max
    var vec = 0
    var l = minLen
    while (l <= maxLen) {
      var s = 0
      while (s < lens.length) {
        if (lens(s) == l) { codes(s) = vec; vec += 1 }
        s += 1
      }
      vec <<= 1
      l += 1
    }
    codes
  }

  /** One RLE1 unit: (encoded bytes, the original bytes they represent). */
  private def rle1Units(data: Array[Byte]): Iterator[(Array[Byte], Int)] =
    new Iterator[(Array[Byte], Int)] {
      private var i = 0
      def hasNext: Boolean = i < data.length
      def next(): (Array[Byte], Int) = {
        val b = data(i)
        var run = 1
        while (run < 259 && i + run < data.length && data(i + run) == b) run += 1
        if (run >= 4) {
          i += run
          (Array(b, b, b, b, (run - 4).toByte), run)
        } else {
          i += 1
          (Array(b), 1)
        }
      }
    }

  def bz2(data: Array[Byte], level: Int = 9): Array[Byte] = {
    require(level >= 1 && level <= 9, s"bzip2 level $level")
    val maxBlock = level * 100000
    val bw = new Bw
    bw.bits('B', 8); bw.bits('Z', 8); bw.bits('h', 8); bw.bits('0' + level, 8)
    var combined = 0
    val units = rle1Units(data)
    var block = new ArrayBuffer[Byte](math.min(data.length + 16, maxBlock))
    var origStart = 0
    var origLen = 0
    def flushBlock(): Unit = {
      if (block.nonEmpty) {
        val crc = new extractous.core.Bzip2.Crc
        var i = origStart
        while (i < origStart + origLen) { crc.update(data(i) & 0xff); i += 1 }
        emitBlock(bw, block.toArray, crc.value)
        combined = ((combined << 1) | (combined >>> 31)) ^ crc.value
        origStart += origLen
        origLen = 0
        block = new ArrayBuffer[Byte]()
      }
    }
    while (units.hasNext) {
      val (enc, orig) = units.next()
      if (block.length + enc.length > maxBlock) flushBlock()
      block ++= enc
      origLen += orig
    }
    flushBlock()
    bw.bits(0x177245, 24); bw.bits(0x385090, 24)
    bw.bits(combined >>> 16, 16); bw.bits(combined & 0xffff, 16)
    bw.result()
  }

  private def emitBlock(bw: Bw, rle: Array[Byte], blockCrc: Int): Unit = {
    bw.bits(0x314159, 24); bw.bits(0x265359, 24)
    bw.bits(blockCrc >>> 16, 16); bw.bits(blockCrc & 0xffff, 16)
    bw.bits(0, 1) // not randomized
    val (last, origPtr) = bwt(rle)
    bw.bits(origPtr, 24)

    // symbol map
    val inUse = new Array[Boolean](256)
    last.foreach(b => inUse(b & 0xff) = true)
    val seqToUnseq = (0 until 256).filter(inUse).toArray
    val unseqToSeq = new Array[Int](256)
    seqToUnseq.zipWithIndex.foreach { case (v, i) => unseqToSeq(v) = i }
    val nInUse = seqToUnseq.length
    val alphaSize = nInUse + 2
    var coarse = 0
    (0 until 16).foreach(i => if ((0 until 16).exists(j => inUse(i * 16 + j))) coarse |= 0x8000 >>> i)
    bw.bits(coarse, 16)
    (0 until 16).foreach { i =>
      if ((coarse & (0x8000 >>> i)) != 0) {
        var m = 0
        (0 until 16).foreach(j => if (inUse(i * 16 + j)) m |= 0x8000 >>> j)
        bw.bits(m, 16)
      }
    }

    // MTF + RLE2 over the BWT column
    val syms = new ArrayBuffer[Int](last.length + 8)
    val mtf = seqToUnseq.clone()
    var zeroRun = 0L
    def flushZeroRun(): Unit = {
      var n = zeroRun
      while (n > 0) {
        val d = if (n % 2 == 0) 2 else 1
        syms += d - 1 // RUNA=0, RUNB=1
        n = (n - d) / 2
      }
      zeroRun = 0
    }
    last.foreach { byte =>
      val v = byte & 0xff
      var j = 0
      while (mtf(j) != v) j += 1
      if (j == 0) zeroRun += 1
      else {
        flushZeroRun()
        val sym = j + 1
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        syms += sym
      }
    }
    flushZeroRun()
    syms += alphaSize - 1 // EOB

    // one Huffman table, declared twice (format floor is 2 groups)
    val freq = new Array[Int](alphaSize)
    syms.foreach(s => freq(s) += 1)
    val lens = huffLengths(freq, 17)
    val codes = assignCodes(lens)
    val nGroups = 2
    val nSelectors = (syms.length + 49) / 50
    bw.bits(nGroups, 3)
    bw.bits(nSelectors, 15)
    (0 until nSelectors).foreach(_ => bw.bits(0, 1)) // MTF'd selector 0
    (0 until nGroups).foreach { _ =>
      var curr = lens(0)
      bw.bits(curr, 5)
      lens.foreach { target =>
        while (curr < target) { bw.bits(2, 2); curr += 1 } // 1,0 = increment
        while (curr > target) { bw.bits(3, 2); curr -= 1 } // 1,1 = decrement
        bw.bits(0, 1)
      }
    }
    syms.foreach(s => bw.bits(codes(s), lens(s)))
  }
}
