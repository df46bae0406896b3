package extractous.iwork

import extractous.config.ExtractorConfig
import extractous.html.{HElem, HNode, HText, HtmlDom}
import extractous.model.{ExtractResult, ExtractStatus}
import extractous.office.ZipUtil
import extractous.text.{Normalize, TextEmitter, XmlEmitter}

/** iWork '09 extraction (Pages) — the last named format of the reference's
  * Tika long tail (/root/reference/README.md:14 "60+ formats" defers to Tika;
  * Tika's IWorkPackageParser handles the '09 package shape). An iWork '09
  * document is a zip whose `index.xml` carries the content as namespaced XML:
  * Pages text lives in `sf:p` paragraphs under `sf:text-body`, in document
  * order. The modern (post-2013) IWA/protobuf shape is NOT parsed — it is
  * rejected with a status (no index.xml ⇒ UnsupportedFormat), never guessed
  * at ("wrong text never").
  */
object IworkExtractor {
  /** Family sentinel lives in [[extractous.sniff.MimeSniffer.Iwork]]; the
    * specific application is only knowable from index.xml's root element,
    * which is this parser's job (same split as CFB vs .doc/.xls/.ppt).
    */
  val Iwork = extractous.sniff.MimeSniffer.Iwork
  val Pages = "application/vnd.apple.pages"

  private def findAll(n: HNode, tag: String): Seq[HElem] = n match {
    case e: HElem =>
      val self = if (e.name.equalsIgnoreCase(tag) || Normalize.lowerAscii(e.name).endsWith(":" + tag)) Seq(e) else Seq.empty
      self ++ e.children.flatMap(findAll(_, tag))
    case _ => Seq.empty
  }

  private def textOf(n: HNode): String = n match {
    case HText(t) => t
    case e: HElem => e.children.map(textOf).mkString
  }

  def extract(bytes: Array[Byte], cfg: ExtractorConfig): ExtractResult = {
    try {
      val entries = ZipUtil.entries(bytes)
      val xml = entries.getOrElse("index.xml",
        return ExtractResult.fail(ExtractStatus.UnsupportedFormat,
          "iwork: no index.xml (post-2013 IWA packages are not supported)", Iwork))
      val dom = HtmlDom.parse(new String(xml, java.nio.charset.StandardCharsets.UTF_8))
      val isPages = findAll(dom, "document").exists(e => Normalize.lowerAscii(e.name).startsWith("sl:"))
      if (!isPages)
        return ExtractResult.fail(ExtractStatus.UnsupportedFormat,
          "iwork: index.xml root is not a Pages sl:document", Iwork)
      val emitter = new TextEmitter(cfg.maxStringLength)
      val xe = new XmlEmitter(cfg.maxStringLength, cfg.xmlOutput)
      var nPara = 0
      findAll(dom, "p").iterator
        .filter(_.name.equalsIgnoreCase("sf:p"))
        .takeWhile(_ => !emitter.isFull)
        .foreach { p =>
          val t = Normalize.line(textOf(p))
          if (t.nonEmpty) {
            nPara += 1
            emitter.addBlock(t)
            if (cfg.xmlOutput) xe.addElement("p", t)
          }
        }
      if (nPara == 0)
        ExtractResult.fail(ExtractStatus.ExtractionFailed, "iwork: no sf:p paragraphs", Pages)
      else
        ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "",
          Map("Content-Type" -> Seq(Pages), "iwork:paragraph-count" -> Seq(nPara.toString)), Pages)
    } catch {
      case e: Exception =>
        ExtractResult.fail(ExtractStatus.ExtractionFailed, s"iwork: ${e.getMessage}", Iwork)
    }
  }
}
