package graft

import extractous.gen.CorpusGen
import extractous.html.{HtmlDom, HtmlExtractor}
import extractous.core.Extract

/** Diagnostic main: stage-level cost decomposition of the HTML extraction
  * hot path (tokenize+DOM / blocks / classify+emit) on the bench-shaped page.
  */
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    val fat = if (args.length > 0) args(0).toInt else 80
    val seed = "key agg row scan slow fast table value part hash value table part a row fast merge batch part value fast spark a a the line sort table window table table key "
    val text = (seed * fat).trim
    val payload = CorpusGen.payload(0, text, "en")
    val html = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    def bench(name: String, n: Int)(f: => Any): Unit = {
      (1 to 500).foreach(_ => f)
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[hp] $name%-22s ${us}%9.1f us/doc")
    }
    bench("full Extract", 2000)(Extract(payload, CorpusGen.flagshipConfig))
    bench("bytes->String", 2000)(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    bench("dom parse", 2000)(HtmlDom.parse(html))
    val dom = HtmlDom.parse(html)
    bench("blocks", 2000)(HtmlExtractor.blocks(dom))
    val (all, _) = HtmlExtractor.blocks(dom)
    bench("classify", 2000)(all.filter(HtmlExtractor.isContent))
    val kept = all.filter(HtmlExtractor.isContent)
    bench("emit", 2000) {
      val e = new extractous.text.TextEmitter(100000000)
      kept.foreach(b => e.addBlock(b.text))
      e.result()
    }
    bench("sniff", 2000)(extractous.sniff.MimeSniffer.sniff(payload))
    // sub-stage decomposition of blocks-shaped work on the big text node
    val big = text
    bench("norm.line(big)", 5000)(extractous.text.Normalize.line(big))
    bench("sb append+toString", 5000) {
      val sb = new java.lang.StringBuilder
      sb.append(big)
      sb.toString
    }
    bench("count spaces", 5000) {
      var n = 1; var i = 0
      while (i < big.length) { if (big.charAt(i) == ' ') n += 1; i += 1 }
      n
    }
    bench("tokenize only", 2000) {
      val it = extractous.html.HtmlTokenizer.tokenize(html)
      var n = 0
      while (it.hasNext) { it.next(); n += 1 }
      n
    }
    bench("decodeEntities(big)", 5000)(extractous.html.HtmlTokenizer.decodeEntities(big))
    // plain-path decomposition
    val plainPayload = CorpusGen.payload(55, text, "en")
    bench("plain Extract", 2000)(Extract(plainPayload, CorpusGen.flagshipConfig))
    bench("plain sniff", 2000)(extractous.sniff.MimeSniffer.sniff(plainPayload))
    bench("isValidUtf8", 5000)(extractous.sniff.MimeSniffer.isValidUtf8(plainPayload))
    bench("looksLikeDelimited", 2000)(extractous.mail.CsvExtractor.looksLikeDelimited(big))
    bench("pdf Extract", 2000)(Extract(CorpusGen.payload(70, text, "en"), CorpusGen.flagshipConfig))
    locally {
      import extractous.pdf.PdfExtractor
      val pdfPayload = CorpusGen.payload(70, text, "en")
      bench("pdf scanObjects", 2000)(PdfExtractor.scanObjects(pdfPayload))
      val (objs, trailer) = PdfExtractor.scanObjects(pdfPayload)
      bench("pdf pages", 2000)(PdfExtractor.pages(objs, trailer))
      val pgs = PdfExtractor.pages(objs, trailer)
      bench("pdf assemble", 2000)(pgs.map(p => PdfExtractor.assembleTagged(p.runs)))
      // sub-stage: inflate vs content-stream lexing (pages = inflate + parse + walk)
      val content = objs.values.collectFirst {
        case so: extractous.pdf.Cos.StreamObj
            if !so.dict.m.contains("Type") => so.data
      }.getOrElse(Array.emptyByteArray)
      bench("pdf inflate", 2000)(PdfExtractor.inflate(content))
      val raw = PdfExtractor.inflate(content)
      bench("pdf parseContent", 2000)(
        PdfExtractor.parseContent(raw, extractous.pdf.Cos.Dict(Map.empty), objs))
      bench("pdf extract direct", 2000)(
        PdfExtractor.extract(pdfPayload, CorpusGen.flagshipConfig, extractous.ocr.GlyphTemplateOcr))
      // same stages extract runs, chained in one loop — isolates whether the
      // sum-of-parts gap is real work or a combined-loop cache/GC artifact
      bench("pdf pipeline sim", 2000) {
        val (o2, t2) = PdfExtractor.scanObjects(pdfPayload)
        val pgs2 = PdfExtractor.pages(o2, t2)
        val em = new extractous.text.TextEmitter(Int.MaxValue)
        pgs2.foreach(p => PdfExtractor.assembleTagged(p.runs).foreach { case (l, _) => em.addBlock(l) })
        em.result()
      }
    }
  }
}
