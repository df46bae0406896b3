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
      "tar_zst" -> CorpusGen.archivePayload(103, text, "en"),
      "7z_archive" -> CorpusGen.archivePayload(200, text, "en"),
      "rar_archive" -> CorpusGen.archivePayload(300, text, "en"),
      "warc" -> CorpusGen.warcPayload(0, text, "en"),
      "warc_gz" -> CorpusGen.warcPayload(100, text, "en"),
      "warc_zst" -> CorpusGen.warcPayload(200, text, "en"),
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

    // Per-row text-stat kernels: linearity in document length. The round-3
    // HOF fingerprint was O(n²) per row (each substr(i,1) rescans the
    // UTF8String) — invisible at oracle-sized ~0.3 KB texts, fatal on real
    // 20–100 KB pages. These rows evidence the imperative replacements are
    // ~linear: a 10×-longer document must cost ≲12× (sort adds the log
    // factor for top2gram).
    import org.apache.spark.unsafe.types.UTF8String
    def probeKernel(name: String, f: UTF8String => Any): Unit = {
      val t1 = UTF8String.fromString((seed * 8).trim)   // ~1.2 KB
      val t10 = UTF8String.fromString((seed * 80).trim) // ~12 KB
      def time(u: UTF8String, n: Int): Double = {
        (1 to 2000).foreach(_ => f(u))
        val t0 = System.nanoTime()
        (1 to n).foreach(_ => f(u))
        (System.nanoTime() - t0) / 1e9 / n
      }
      val (a, b) = (time(t1, 20000), time(t10, 2000))
      println(f"[perf] $name%-12s 1x=${a * 1e6}%8.2f us  10x=${b * 1e6}%8.2f us  ratio=${b / a}%5.2f (linear=10)")
    }
    probeKernel("fingerprint", extractous.spark.FingerprintHash.compute)
    probeKernel("top2gram", extractous.spark.Top2GramHash.compute)
    probeKernel("c4_clean", extractous.spark.C4Kernel.compute)
    probeKernel("gopher", u => extractous.spark.GopherKernel.compute(u, 10))
    locally {
      // dsir_score walks the token array once (hash + two table lookups per
      // gram) — must be ~linear in token count like its neighbors
      val lambda = Array.tabulate(8192)(i => (i % 13).toLong - 6)
      def toArr(s: String) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        s.trim.split("\\s+").map(t => UTF8String.fromString(t)).toArray[Any])
      probeArr("dsir_score", a => extractous.spark.DsirKernel.score(a, lambda), toArr)
    }
  }

  private def probeArr(name: String,
      f: org.apache.spark.sql.catalyst.util.GenericArrayData => Any,
      mk: String => org.apache.spark.sql.catalyst.util.GenericArrayData): Unit = {
    val seed = "key agg row scan slow fast table value part hash value table part a row fast merge batch part value fast spark a a the line sort table window table table key "
    val (a1, a10) = (mk(seed * 8), mk(seed * 80))
    def time(u: org.apache.spark.sql.catalyst.util.GenericArrayData, n: Int): Double = {
      (1 to 2000).foreach(_ => f(u))
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f(u))
      (System.nanoTime() - t0) / 1e9 / n
    }
    val (a, b) = (time(a1, 20000), time(a10, 2000))
    println(f"[perf] $name%-12s 1x=${a * 1e6}%8.2f us  10x=${b * 1e6}%8.2f us  ratio=${b / a}%5.2f (linear=10)")
  }
}
