package extractous.core

/** Branch-converter ("BRA") filters shared by the xz and 7z containers:
  * the x86 BCJ call/jump absolute↔relative address transform and the byte
  * delta filter, per the public xz file-format and 7zFormat.txt specs (the
  * algorithm is the published liblzma/7-Zip "x86 simple filter": E8/E9
  * opcode scan with the 5-bit alias-prevention mask). These filters are
  * LENGTH-PRESERVING transforms applied before LZMA/LZMA2 so that x86 code
  * sections compress; the decoder applies the inverse after decompression.
  *
  * Both directions are implemented — decode for the readers, encode so the
  * fixture writers can produce filtered archives independently — and the
  * decode path is validated against real `xz --x86` / `--delta` CLI output
  * (XzSpec goldens), so the transform is proven against the reference
  * implementation, not its own inverse alone.
  */
object Bra {

  @inline private def msByteOk(b: Int): Boolean = (b & 0xFF) == 0 || (b & 0xFF) == 0xFF

  private val MaskAllowed = Array(true, true, true, false, true, false, false, false)
  private val MaskBit = Array(0, 1, 2, 2, 3, 3, 3, 3)

  /** In-place x86 BCJ transform over the whole buffer (stream position 0).
    * `encoding = false` restores relative displacements (the decode side).
    */
  def x86(data: Array[Byte], encoding: Boolean): Unit = {
    if (data.length < 5) return
    var prevMask = 0
    var prevPos = -5L // initial state: as if the last opcode were 5 bytes back
    val limit = data.length - 5
    var pos = 0
    while (pos <= limit) {
      val op = data(pos) & 0xFF
      if (op != 0xE8 && op != 0xE9) pos += 1
      else {
        val offset = pos - prevPos
        prevPos = pos
        if (offset > 5) prevMask = 0
        else {
          var i = 0L
          while (i < offset) { prevMask &= 0x77; prevMask <<= 1; i += 1 }
        }
        val b4 = data(pos + 4) & 0xFF
        if (msByteOk(b4) && MaskAllowed((prevMask >> 1) & 0x7) && (prevMask >> 1) < 0x10) {
          var src = (b4 << 24) | ((data(pos + 3) & 0xFF) << 16) |
            ((data(pos + 2) & 0xFF) << 8) | (data(pos + 1) & 0xFF)
          var dest = 0
          var loop = true
          while (loop) {
            dest = if (encoding) src + (pos + 5) else src - (pos + 5)
            if (prevMask == 0) loop = false
            else {
              val i = MaskBit(prevMask >> 1)
              val b = (dest >>> (24 - i * 8)) & 0xFF
              if (!msByteOk(b)) loop = false
              else src = dest ^ (((1L << (32 - i * 8)) - 1).toInt)
            }
          }
          data(pos + 4) = (~(((dest >>> 24) & 1) - 1)).toByte
          data(pos + 3) = (dest >>> 16).toByte
          data(pos + 2) = (dest >>> 8).toByte
          data(pos + 1) = dest.toByte
          pos += 5
        } else {
          prevMask |= 1
          if (msByteOk(b4)) prevMask |= 0x10
          pos += 1
        }
      }
    }
  }

  /** In-place delta decode: out[i] = in[i] + out[i-dist] (history zeros). */
  def deltaDecode(data: Array[Byte], dist: Int): Unit = {
    require(dist >= 1 && dist <= 256, "delta distance out of 1..256")
    var i = dist
    while (i < data.length) { data(i) = (data(i) + data(i - dist)).toByte; i += 1 }
  }

  /** In-place delta encode: out[i] = in[i] - in[i-dist]. */
  def deltaEncode(data: Array[Byte], dist: Int): Unit = {
    require(dist >= 1 && dist <= 256, "delta distance out of 1..256")
    var i = data.length - 1
    while (i >= dist) { data(i) = (data(i) - data(i - dist)).toByte; i -= 1 }
  }
}
