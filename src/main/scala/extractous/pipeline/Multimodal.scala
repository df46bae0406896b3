package extractous.pipeline

import extractous.config.OcrConfig
import extractous.ocr.{Bmp, Gif, Gray, GlyphTemplateOcr, Jpeg, Png, Tiff}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: images/audio/video ride as opaque `binary` columns with
  * typed metadata extracted by per-partition batch transforms (the Scala
  * analogue of a `mapInPandas` decode stage: one iterator pass per partition,
  * decode in-JVM, emit typed rows — no shuffle, no driver collect).
  *
  * Image decode (BMP/PNG/JPEG/GIF/TIFF) and resize are REAL (our own codecs).
  * Video is REAL MJPEG-in-AVI: a RIFF container walk (`hdrl`/`movi`/`00dc`)
  * whose frames are baseline JPEGs decoded by [[extractous.ocr.Jpeg]] — no
  * ffmpeg in this sandbox, but RIFF + MJPEG needs none. Audio is a real
  * RIFF/WAVE PCM header codec.
  */
object Multimodal {

  final case class ImageMeta(id: Long, width: Int, height: Int, format: String, ink_pixels: Long)
  final case class ResizedImage(id: Long, width: Int, height: Int, bytes: Array[Byte])
  final case class VideoFrames(id: Long, n_frames: Int, sampled_frames: Seq[Int], first_frame_text: String)
  final case class AudioMeta(id: Long, sample_rate: Int, channels: Int, bits: Int, n_samples: Long, duration_ms: Long)

  private def decodeImage(bytes: Array[Byte]): (Gray, String) =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') (Bmp.decode(bytes), "bmp")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) (Jpeg.decode(bytes), "jpeg")
    else if (bytes.length >= 6 && new String(bytes, 0, 3, "US-ASCII") == "GIF") (Gif.decode(bytes), "gif")
    else if (bytes.length >= 4 && ((bytes(0) == 'I' && bytes(1) == 'I') ||
      (bytes(0) == 'M' && bytes(1) == 'M'))) (Tiff.decode(bytes), "tiff")
    else (Png.decode(bytes), "png")

  /** (id, image bytes) → typed metadata; per-row narrow transform. */
  def imageMeta(ds: Dataset[(Long, Array[Byte])]): Dataset[ImageMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { case (id, bytes) =>
      val (g, fmt) = decodeImage(bytes)
      ImageMeta(id, g.width, g.height, fmt, g.pixels.count(_ != 0).toLong)
    }
  }

  /** Real nearest-neighbor downscale by integer factor, re-encoded as BMP. */
  def resize(ds: Dataset[(Long, Array[Byte])], factor: Int): Dataset[ResizedImage] = {
    require(factor > 0, s"resize factor must be positive, got $factor")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { case (id, bytes) =>
      val (g, _) = decodeImage(bytes)
      val w = math.max(1, g.width / factor)
      val h = math.max(1, g.height / factor)
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = g(x * factor, y * factor).toByte; x += 1 }
        y += 1
      }
      ResizedImage(id, w, h, Bmp.encode(Gray(w, h, px)))
    }
  }

  /** MJPEG-in-AVI: a real RIFF container — `RIFF('AVI ')` holding
    * `LIST('hdrl')` with an `avih` main header and `LIST('movi')` with one
    * `00dc` chunk per JPEG frame (the classic MJPEG layout every camera and
    * ffmpeg emit). The walker is a plain RIFF chunk scan; frames decode with
    * the in-repo baseline JPEG codec.
    */
  object Avi {
    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    def encode(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
      def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
        val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
        val bb = java.nio.ByteBuffer.allocate(8 + padded.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(fourcc(id)).putInt(payload.length).put(padded)
        bb.array()
      }
      def list(typ: String, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(12 + body.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(fourcc("LIST")).putInt(4 + body.length).put(fourcc(typ)).put(body)
        bb.array()
      }
      val avih = {
        val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(100000)          // usec per frame (10 fps)
        bb.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags (no idx1 written, so HASINDEX must be off)
        bb.putInt(frames.length)   // total frames
        bb.putInt(0).putInt(1)     // initial frames, streams
        bb.putInt(0)               // suggested buffer
        bb.putInt(width).putInt(height)
        bb.putInt(0).putInt(0).putInt(0).putInt(0)
        chunk("avih", bb.array())
      }
      val hdrl = list("hdrl", avih)
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = fourcc("AVI ") ++ hdrl ++ movi
      val bb = java.nio.ByteBuffer.allocate(8 + body.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc("RIFF")).putInt(body.length).put(body)
      bb.array()
    }

    /** All `00dc`/`00db` frame payloads from the `movi` list, document order. */
    def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
      require(bytes.length >= 12 && new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI")
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id = new String(bytes, pos, 4, "US-ASCII")
          val len = bb.getInt(pos + 4)
          require(len >= 0 && pos + 8 + len <= to, s"avi: chunk '$id' overruns container")
          if (id == "LIST") {
            val typ = new String(bytes, pos + 8, 4, "US-ASCII")
            walk(pos + 12, pos + 8 + len, inMovi || typ == "movi")
          } else if (inMovi && (id.endsWith("dc") || id.endsWith("db"))) {
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
          }
          pos += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
      val riffEnd = 8 + bb.getInt(4)
      // lower bound guards a negative/undersized size dword, which would
      // otherwise walk zero chunks and report a corrupt file as "0 frames"
      require(riffEnd >= 12 && riffEnd <= bytes.length, "avi: truncated RIFF payload")
      walk(12, riffEnd, inMovi = false)
      frames.result()
    }
  }

  /** Frame sampling: keep every `step`-th frame; OCR the first sampled frame
    * (feature extraction downstream of sampling).
    */
  def frameSample(ds: Dataset[(Long, Array[Byte])], step: Int): Dataset[VideoFrames] = {
    require(step > 0, s"frameSample step must be positive, got $step")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { case (id, bytes) =>
      val frames = Avi.decode(bytes)
      val sampled = frames.indices.filter(_ % step == 0)
      val t = if (sampled.nonEmpty) GlyphTemplateOcr.recognize(frames(sampled.head), OcrConfig()) else ""
      VideoFrames(id, frames.length, sampled, t)
    }
  }

  // ---- minimal but real RIFF/WAVE header codec (PCM) ----
  object Wav {
    def encode(sampleRate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
      val dataLen = nSamples * channels * (bits / 8)
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      bb.putShort(channels.toShort).putInt(sampleRate)
      bb.putInt(sampleRate * channels * (bits / 8)).putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      // deterministic payload: simple sawtooth
      var i = 0
      while (i < dataLen) { bb.put(((i * 7) % 251 - 125).toByte); i += 1 }
      bb.array()
    }

    def decode(bytes: Array[Byte]): AudioMeta = {
      require(bytes.length >= 44 && new String(bytes, 0, 4, "US-ASCII") == "RIFF"
        && new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val channels = bb.getShort(22).toInt
      val rate = bb.getInt(24)
      val bits = bb.getShort(34).toInt
      val dataLen = bb.getInt(40)
      // the header's declared data length must actually be present: a
      // truncated WAV must error, not fabricate n_samples/duration from air
      require(dataLen >= 0 && 44L + dataLen <= bytes.length, "wav: truncated data chunk")
      val n = dataLen / math.max(1, channels * (bits / 8))
      AudioMeta(0L, rate, channels, bits, n.toLong, n.toLong * 1000L / math.max(1, rate))
    }
  }

  def audioMeta(ds: Dataset[(Long, Array[Byte])]): Dataset[AudioMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { case (id, bytes) => Wav.decode(bytes).copy(id = id) }
  }
}
