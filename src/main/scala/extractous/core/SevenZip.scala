package extractous.core

/** 7z (.7z) member walk — the archive format's container structure from the
  * published 7zFormat.txt spec. Copy (0x00), LZMA1 (0x030101) and LZMA2
  * (0x21) folders are decoded through the from-scratch [[Lzma]] decoder,
  * including FILTER CHAINS of Delta (0x03) and BCJ x86 (0x03030103) wired
  * by bind pairs — the `-mf=BCJ`/`-mf=Delta` layouts executables-adjacent
  * strata ship ([[Bra]] provides the transforms, CLI-golden-validated in
  * XzSpec). Compressed (kEncodedHeader) metadata — what `7z a` writes by
  * default — is decoded and re-parsed, so real-world archives open, not
  * just store mode. Folders with any other coder (BCJ2, BZip2, PPMd, AES)
  * are rejected with [[UnsupportedArchiveException]] → status −8 upstream —
  * honest "we can see the members but won't guess their bytes", never
  * garbage. File-heavy crawl strata carry .7z alongside zip/tar; Tika (the
  * reference's engine) descends them via Commons Compress
  * (/root/reference/README.md:271-273).
  *
  * Scope: chains of up to 4 simple coders, one pack stream and one
  * substream per folder, no empty streams. Both header CRCs are verified;
  * any structural damage throws IllegalArgumentException → status −4.
  * Unpacked sizes are bomb-capped inside the LZMA decoders and by the
  * aggregate budget (intermediate chain outputs included).
  */
final class UnsupportedArchiveException(msg: String) extends RuntimeException(msg)

object SevenZip {
  val Signature: Array[Byte] =
    Array('7'.toByte, 'z'.toByte, 0xBC.toByte, 0xAF.toByte, 0x27.toByte, 0x1C.toByte)

  def looksLike7z(bytes: Array[Byte]): Boolean =
    bytes.length >= 32 && (0 until 6).forall(i => bytes(i) == Signature(i))

  /** Aggregate decompression-bomb cap across ALL folders of one archive
    * (matches [[Rar.MaxTotalBytes]]). Individual folders are additionally
    * capped by the LZMA decoders.
    */
  private val MaxTotalBytes = 256L * 1024 * 1024

  /** RAR 4.x and 5.x signatures. RAR5 routes to [[Rar.members]] (store-mode
    * members extract; compressed members refuse); RAR4 stays a
    * detection-only refusal so it never mojibakes through the text rungs.
    */
  def looksLikeRar(bytes: Array[Byte]): Boolean =
    bytes.length >= 7 && bytes(0) == 'R' && bytes(1) == 'a' && bytes(2) == 'r' &&
      bytes(3) == '!' && bytes(4) == 0x1A && bytes(5) == 0x07 &&
      (bytes(6) == 0x00 || (bytes(6) == 0x01 && bytes.length >= 8 && bytes(7) == 0x00))

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = BinUtil.crc32(b, off, len)

  private def u32le(b: Array[Byte], off: Int): Long = BinUtil.u32le(b, off)

  private def u64le(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Cursor over the end-header property stream. */
  private final class Rd(val b: Array[Byte]) {
    var pos = 0
    def byte(): Int = {
      if (pos >= b.length) throw new IllegalArgumentException("7z: truncated header")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def bytes(n: Int): Array[Byte] = {
      if (pos + n > b.length) throw new IllegalArgumentException("7z: truncated header")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    /** 7z variable-length number (spec ReadNumber). */
    def num(): Long = {
      val first = byte()
      var mask = 0x80
      var value = 0L
      var i = 0
      while (i < 8) {
        if ((first & mask) == 0) {
          return value | ((first & (mask - 1)).toLong << (8 * i))
        }
        value |= (byte().toLong << (8 * i))
        mask >>= 1
        i += 1
      }
      value
    }
    def numInt(cap: Int, what: String): Int = {
      val v = num()
      if (v < 0 || v > cap) throw new IllegalArgumentException(s"7z: $what out of range ($v)")
      v.toInt
    }
  }

  // property ids (7zFormat.txt)
  private final val kEnd = 0x00
  private final val kHeader = 0x01
  private final val kEncodedHeader = 0x17
  private final val kMainStreamsInfo = 0x04
  private final val kFilesInfo = 0x05
  private final val kPackInfo = 0x06
  private final val kUnPackInfo = 0x07
  private final val kSubStreamsInfo = 0x08
  private final val kSize = 0x09
  private final val kCRC = 0x0A
  private final val kFolder = 0x0B
  private final val kCodersUnpackSize = 0x0C
  private final val kNumUnPackStream = 0x0D
  private final val kEmptyStream = 0x0E
  private final val kName = 0x11

  /** Skip a CRC digest structure for `n` streams; returns how many streams
    * had a DEFINED digest (SubStreamsInfo needs this: its digest set covers
    * only streams whose CRC was NOT already defined at folder level).
    */
  private def skipDigests(r: Rd, n: Int): Int = {
    val allDefined = r.byte()
    val defined =
      if (allDefined != 0) n
      else {
        // bit vector, high bit first
        var cnt = 0
        var i = 0
        var cur = 0
        var maskLeft = 0
        while (i < n) {
          if (maskLeft == 0) { cur = r.byte(); maskLeft = 8 }
          if ((cur & 0x80) != 0) cnt += 1
          cur = (cur << 1) & 0xff
          maskLeft -= 1
          i += 1
        }
        cnt
      }
    r.bytes(4 * defined)
    defined
  }

  private final case class CoderInfo(id: Array[Byte], props: Array[Byte])
  /** One folder: a chain of simple (1-in/1-out) coders wired by bind pairs
    * (inIndex, outIndex); `outSizes` has one entry per coder output in coder
    * order. The folder's final output is the out-stream no bind pair consumes.
    */
  private final case class FolderInfo(coders: Array[CoderInfo],
      bindPairs: Array[(Int, Int)], outSizes: Array[Long]) {
    def finalOutIndex: Int = {
      val used = bindPairs.map(_._2).toSet
      val free = coders.indices.filterNot(used.contains)
      if (free.length != 1)
        throw new IllegalArgumentException(s"7z: folder has ${free.length} final outputs")
      free.head
    }
    def unpackSize: Long = outSizes(finalOutIndex)
  }
  private final case class StreamsInfo(packPos: Long, packSizes: Array[Long],
      folders: Array[FolderInfo])

  /** Parse a StreamsInfo property set (the body of kMainStreamsInfo, or the
    * payload of kEncodedHeader) up to and including its terminating kEnd.
    * Enforces the supported shape: one non-complex coder per folder, one
    * pack stream per folder, one substream per folder.
    */
  private def parseStreamsInfo(r: Rd): StreamsInfo = {
    var packSizes: Array[Long] = Array.empty
    var packPos = 0L
    var numFolders = 0
    var folders: Array[FolderInfo] = Array.empty
    var folderCrcDefined = 0
    var sid = r.byte()
    while (sid != kEnd) {
      sid match {
        case `kPackInfo` =>
          packPos = r.num()
          val numPack = r.numInt(1 << 20, "pack stream count")
          var pid = r.byte()
          while (pid != kEnd) {
            pid match {
              case `kSize` => packSizes = Array.fill(numPack)(r.num())
              case `kCRC`  => skipDigests(r, numPack)
              case other   => throw new IllegalArgumentException(f"7z: PackInfo property 0x$other%02x")
            }
            pid = r.byte()
          }
        case `kUnPackInfo` =>
          if (r.byte() != kFolder) throw new IllegalArgumentException("7z: expected kFolder")
          numFolders = r.numInt(1 << 20, "folder count")
          if (r.byte() != 0) throw new UnsupportedArchiveException("external folder data")
          folders = (0 until numFolders).map { _ =>
            // chains of up to 4 SIMPLE (1-in/1-out) coders wired by bind
            // pairs — the layout `7z a -mf=BCJ` / `-mf=Delta` writes.
            // Complex (multi-stream) coders stay refused (-8): they exist
            // only for BCJ2, whose 4-input topology is out of scope.
            val numCoders = r.numInt(4, "coder count")
            val coders = (0 until numCoders).map { _ =>
              val flag = r.byte()
              val idSize = flag & 0x0f
              val coderId = r.bytes(idSize)
              if ((flag & 0x10) != 0)
                throw new UnsupportedArchiveException("complex (multi-stream) coder")
              val props =
                if ((flag & 0x20) != 0) r.bytes(r.numInt(1 << 16, "coder props"))
                else Array.emptyByteArray
              CoderInfo(coderId, props)
            }.toArray
            // all coders simple → numInStreams = numOutStreams = numCoders,
            // numBindPairs = numCoders - 1, numPackedStreams = 1 (its index
            // is implied, not stored, when there is exactly one)
            val bindPairs = (0 until numCoders - 1).map { _ =>
              val in = r.numInt(numCoders - 1, "bind pair in-index")
              val outI = r.numInt(numCoders - 1, "bind pair out-index")
              (in, outI)
            }.toArray
            if (bindPairs.map(_._1).distinct.length != bindPairs.length ||
                bindPairs.map(_._2).distinct.length != bindPairs.length)
              throw new IllegalArgumentException("7z: duplicate bind pair endpoints")
            FolderInfo(coders, bindPairs, Array.empty)
          }.toArray
          var uid = r.byte()
          while (uid != kEnd) {
            uid match {
              case `kCodersUnpackSize` =>
                // one size per coder OUTPUT in folder/coder order
                folders = folders.map(f =>
                  f.copy(outSizes = Array.fill(f.coders.length)(r.num())))
              case `kCRC`              => folderCrcDefined = skipDigests(r, numFolders)
              case other => throw new IllegalArgumentException(f"7z: UnPackInfo property 0x$other%02x")
            }
            uid = r.byte()
          }
        case `kSubStreamsInfo` =>
          var ssid = r.byte()
          while (ssid != kEnd) {
            ssid match {
              case `kNumUnPackStream` =>
                (0 until numFolders).foreach { _ =>
                  if (r.num() != 1L)
                    throw new UnsupportedArchiveException("multiple substreams per folder")
                }
              case `kSize` => // sizes of non-last substreams: none when all counts are 1
              case `kCRC`  =>
                // spec: digests only for streams whose CRC is not already
                // defined at folder level (one substream per folder is
                // enforced above, so counts line up)
                skipDigests(r, numFolders - folderCrcDefined)
                ()
              case other   => throw new IllegalArgumentException(f"7z: SubStreams property 0x$other%02x")
            }
            ssid = r.byte()
          }
        case other => throw new IllegalArgumentException(f"7z: StreamsInfo property 0x$other%02x")
      }
      sid = r.byte()
    }
    if (numFolders != packSizes.length)
      throw new UnsupportedArchiveException(
        s"folder/pack mismatch ($numFolders folders, ${packSizes.length} packs)")
    folders.foreach { f =>
      if (f.outSizes.length != f.coders.length)
        throw new IllegalArgumentException(
          s"7z: kCodersUnpackSize carries ${f.outSizes.length} sizes for ${f.coders.length} coders")
      f.finalOutIndex // validates exactly one unconsumed output
    }
    StreamsInfo(packPos, packSizes, folders)
  }

  /** Slice folder i's (single) pack stream out of the archive body. */
  private def packSlice(bytes: Array[Byte], si: StreamsInfo, i: Int): Array[Byte] = {
    var off = 32 + si.packPos
    var j = 0
    while (j < i) { off += si.packSizes(j); j += 1 }
    val sz = si.packSizes(i)
    if (sz < 0 || sz > Int.MaxValue || off < 0 || off + sz > bytes.length)
      throw new IllegalArgumentException("7z: pack stream overruns archive")
    java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
  }

  private final val CoderCopy = Array[Byte](0x00)
  private final val CoderLzma = Array[Byte](0x03, 0x01, 0x01)
  private final val CoderLzma2 = Array[Byte](0x21)
  private final val CoderDelta = Array[Byte](0x03)
  private final val CoderBcjX86 = Array[Byte](0x03, 0x03, 0x01, 0x03)

  /** Decode one coder's output given its already-decoded input. */
  private def decodeCoder(c: CoderInfo, input: Array[Byte], outSize: Long): Array[Byte] = {
    if (java.util.Arrays.equals(c.id, CoderCopy)) {
      if (input.length.toLong != outSize)
        throw new IllegalArgumentException("7z: Copy coder in/out size mismatch")
      input
    } else if (java.util.Arrays.equals(c.id, CoderLzma)) {
      Lzma.decode(c.props, input, outSize)
    } else if (java.util.Arrays.equals(c.id, CoderLzma2)) {
      Lzma.decodeLzma2(input, outSize)
    } else if (java.util.Arrays.equals(c.id, CoderDelta)) {
      // length-preserving filter; props = one byte, distance - 1
      if (c.props.length != 1) throw new IllegalArgumentException("7z: bad delta props")
      if (input.length.toLong != outSize)
        throw new IllegalArgumentException("7z: delta coder in/out size mismatch")
      val out = input.clone()
      Bra.deltaDecode(out, (c.props(0) & 0xFF) + 1)
      out
    } else if (java.util.Arrays.equals(c.id, CoderBcjX86)) {
      if (input.length.toLong != outSize)
        throw new IllegalArgumentException("7z: BCJ coder in/out size mismatch")
      val out = input.clone()
      Bra.x86(out, encoding = false)
      out
    } else {
      val hexId = c.id.map(b => f"${b & 0xff}%02x").mkString
      throw new UnsupportedArchiveException(
        s"unsupported coder 0x$hexId (Copy/LZMA/LZMA2/Delta/BCJ-x86 only)")
    }
  }

  /** Decode a folder's final output by walking the bind-pair chain from the
    * packed stream. All coders are simple, so out-stream j belongs to coder
    * j and coder j's single input is in-stream j: the input is either the
    * pack stream (no bind pair consumes in-stream j) or another coder's
    * output (the bind pair (j, k) routes out-stream k into it).
    */
  private def decodeFolder(f: FolderInfo, packed: Array[Byte]): Array[Byte] = {
    def outStream(outIdx: Int, depth: Int): Array[Byte] = {
      if (depth > f.coders.length)
        throw new IllegalArgumentException("7z: bind pair cycle")
      val input = f.bindPairs.find(_._1 == outIdx) match {
        case Some((_, srcOut)) => outStream(srcOut, depth + 1)
        case None              => packed
      }
      decodeCoder(f.coders(outIdx), input, f.outSizes(outIdx))
    }
    outStream(f.finalOutIndex, 0)
  }

  /** Ordered (name, bytes) members. Copy, LZMA and LZMA2 folders are
    * decoded (one coder / one substream per folder); compressed
    * (kEncodedHeader) metadata - what `7z a` writes by default - is
    * decoded and re-parsed.
    */
  def members(bytes: Array[Byte], maxTotal: Long = MaxTotalBytes): Seq[(String, Array[Byte])] = {
    if (!looksLike7z(bytes)) throw new IllegalArgumentException("7z: bad signature")
    if (crc32(bytes, 12, 20) != u32le(bytes, 8))
      throw new IllegalArgumentException("7z: start header CRC mismatch")
    val nhOffset = u64le(bytes, 12)
    val nhSize = u64le(bytes, 20)
    if (nhOffset < 0 || nhSize <= 0 || nhSize > Int.MaxValue ||
        32 + nhOffset + nhSize > bytes.length)
      throw new IllegalArgumentException("7z: end header out of bounds")
    val rawHeader = java.util.Arrays.copyOfRange(bytes, (32 + nhOffset).toInt, (32 + nhOffset + nhSize).toInt)
    if (crc32(rawHeader, 0, rawHeader.length) != u32le(bytes, 28))
      throw new IllegalArgumentException("7z: end header CRC mismatch")

    var r = new Rd(rawHeader)
    r.byte() match {
      case `kHeader` => ()
      case `kEncodedHeader` =>
        // the header itself is a compressed folder; decode it and re-parse
        val hsi = parseStreamsInfo(r)
        if (hsi.folders.length != 1)
          throw new UnsupportedArchiveException("multi-folder encoded header")
        val decoded = decodeFolder(hsi.folders(0), packSlice(bytes, hsi, 0))
        r = new Rd(decoded)
        if (r.byte() != kHeader)
          throw new IllegalArgumentException("7z: encoded header does not contain kHeader")
      case other => throw new IllegalArgumentException(f"7z: unexpected root property 0x$other%02x")
    }

    var si: StreamsInfo = StreamsInfo(0L, Array.empty, Array.empty)
    var names: Seq[String] = Seq.empty
    var sawStreams = false

    var id = r.byte()
    while (id != kEnd) {
      id match {
        case `kMainStreamsInfo` =>
          si = parseStreamsInfo(r)
          sawStreams = true
        case `kFilesInfo` =>
          val numFiles = r.numInt(1 << 20, "file count")
          var fid = r.byte()
          while (fid != kEnd) {
            val size = r.numInt(Int.MaxValue, "property size")
            fid match {
              case `kName` =>
                val data = r.bytes(size)
                if (data.isEmpty || data(0) != 0)
                  throw new UnsupportedArchiveException("external file names")
                // UTF-16LE names, each terminated by 0x0000
                val out = scala.collection.mutable.ArrayBuffer.empty[String]
                var start = 1
                var i = 1
                while (i + 1 < data.length) {
                  if (data(i) == 0 && data(i + 1) == 0) {
                    out += new String(data, start, i - start, java.nio.charset.StandardCharsets.UTF_16LE)
                    start = i + 2
                  }
                  i += 2
                }
                names = out.toSeq
              case `kEmptyStream` =>
                throw new UnsupportedArchiveException("empty-stream entries (directories/empty files)")
              case _ => r.bytes(size) // kMTime, kAttributes, ... - structurally skipped
            }
            fid = r.byte()
          }
          if (names.length != numFiles)
            throw new IllegalArgumentException(s"7z: ${names.length} names for $numFiles files")
        case other => throw new IllegalArgumentException(f"7z: header property 0x$other%02x")
      }
      id = r.byte()
    }

    if (!sawStreams || names.length != si.folders.length)
      throw new UnsupportedArchiveException(
        s"folder/file mismatch (${si.folders.length} folders, ${names.length} files)")
    // aggregate decompression budget: each folder is individually capped by
    // the LZMA decoders, but a crafted archive declaring thousands of folders
    // would otherwise multiply that cap without bound (same posture as
    // Rar.MaxTotalBytes) — refuse before decoding anything
    // intermediate chain outputs count too: a filter chain materializes them
    val totalDeclared = si.folders.iterator.flatMap(_.outSizes).foldLeft(0L) { (a, s) =>
      if (s < 0 || a + s < 0) throw new IllegalArgumentException("7z: unpack size overflow")
      a + s
    }
    if (totalDeclared > maxTotal)
      throw new IllegalArgumentException(
        s"7z: aggregate declared unpack size $totalDeclared exceeds budget $maxTotal")
    names.indices.map { i =>
      (names(i), decodeFolder(si.folders(i), packSlice(bytes, si, i)))
    }
  }
}
