package graft

import extractous.gen.CorpusGen
import extractous.pdf.PdfExtractor

/** Diagnostic main (not part of the driver contract): tight-loop PDF kernel
  * timings with interleaved reps, so A/B comparisons survive this host's
  * minute-scale CPU drift. Reports min-of-reps per stage.
  */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    val fat = if (args.length > 0) args(0).toInt else 80
    val reps = if (args.length > 1) args(1).toInt else 5
    val seed = "key agg row scan slow fast table value part hash value table part a row fast merge batch part value fast spark a a the line sort table window table table key "
    val text = (seed * fat).trim
    val payload = CorpusGen.payload(70, text, "en")
    val (objs, trailer) = PdfExtractor.scanObjects(payload)
    val content = objs.values.collectFirst {
      case so: extractous.pdf.Cos.StreamObj if !so.dict.m.contains("Type") => so.data
    }.getOrElse(Array.emptyByteArray)
    val raw = PdfExtractor.inflate(content)
    val pgs = PdfExtractor.pages(objs, trailer)

    def one(n: Int)(f: => Any): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e3 / n
    }
    val stages: Seq[(String, Int, () => Any)] = Seq(
      ("parseContent", 2000, () => PdfExtractor.parseContent(raw, extractous.pdf.Cos.Dict(Map.empty), objs)),
      ("assemble", 2000, () => pgs.map(p => PdfExtractor.assembleTagged(p.runs))),
      ("extract", 1000, () => PdfExtractor.extract(payload, CorpusGen.flagshipConfig, extractous.ocr.GlyphTemplateOcr)))
    // warmup
    stages.foreach { case (_, n, f) => (1 to n).foreach(_ => f()) }
    val mins = scala.collection.mutable.Map.empty[String, Double]
    (1 to reps).foreach { _ =>
      stages.foreach { case (name, n, f) =>
        val us = one(n)(f())
        mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), us)
      }
    }
    stages.foreach { case (name, _, _) =>
      println(f"[pdfp] $name%-14s min=${mins(name)}%8.1f us/doc")
    }
  }
}
