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
  }
}
