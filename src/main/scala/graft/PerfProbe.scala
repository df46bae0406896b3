package graft

import extractous.core.Extract
import extractous.gen.CorpusGen

/** Single-thread per-format extraction microbenchmark (not part of the driver
  * contract) — identifies the per-byte cost of each parser.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val fat = if (args.length > 0) args(0).toInt else 80
    val seed = "key agg row scan slow fast table value part hash value table part a row fast merge batch part value fast spark a a the line sort table window table table key "
    val text = (seed * fat).trim
    val kinds = Seq[(String, Array[Byte])](
      "html" -> CorpusGen.payload(0, text, "en"),
      "markdown" -> CorpusGen.payload(52, text, "en"),
      "eml" -> CorpusGen.payload(53, text, "en"), // id/100 even: multipart QP+base64
      "epub" -> CorpusGen.payload(54, text, "en"),
      "plain" -> CorpusGen.payload(55, text, "en"),
      "xls" -> CorpusGen.payload(61, text, "en"),
      "ppt" -> CorpusGen.payload(62, text, "en"),
      "sjis" -> CorpusGen.payload(64, text, "en"),
      "utf16" -> CorpusGen.payload(65, text, "en"),
      "cp1252" -> CorpusGen.payload(68, text, "en"),
      "pdf" -> CorpusGen.payload(70, text, "en"),
      "docx" -> CorpusGen.payload(82, text, "en"),
      "doc" -> CorpusGen.payload(87, text, "en"),
      "odt" -> CorpusGen.payload(88, text, "en"),
      "bmp_ocr" -> CorpusGen.payload(90, text, "en"),
      "jpeg_ocr" -> CorpusGen.payload(92, text, "en"),
      "gif_ocr" -> CorpusGen.payload(93, text, "en"),
      "tiff_ocr" -> CorpusGen.payload(94, text, "en"), // id/100 even: PackBits
      "scanned_pdf" -> CorpusGen.payload(96, text, "en"),
      "msg" -> extractous.gen.MsgWriter.msg("Subject 1", "Sender 1", text, unicode = true),
      "zip_archive" -> CorpusGen.archivePayload(0, text, "en"),
      "tar_archive" -> CorpusGen.archivePayload(100, text, "en"),
      "warc" -> CorpusGen.warcPayload(0, text, "en"),
      "warc_gz" -> CorpusGen.warcPayload(100, text, "en"),
      "ics" -> CorpusGen.calPayload(0, text),
      "vcf" -> CorpusGen.calPayload(100, text),
      "pages" -> extractous.gen.PagesWriter.pages(Seq("Document 1", text)))
    kinds.foreach { case (kind, payload) =>
      // warmup
      (1 to 200).foreach(_ => Extract(payload, CorpusGen.flagshipConfig))
      val n = 2000
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => Extract(payload, CorpusGen.flagshipConfig))
      val secs = (System.nanoTime() - t0) / 1e9
      val mbps = payload.length.toDouble * n / secs / 1e6
      println(f"[perf] $kind%-12s payload=${payload.length}%7d B  ${n / secs}%8.0f docs/s  $mbps%8.1f MB/s/core")
    }
  }
}
