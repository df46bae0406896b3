package extractous.epub

import extractous.config.ExtractorConfig
import extractous.html.{HElem, HNode, HText, HtmlDom}
import extractous.model.{ExtractResult, ExtractStatus}
import extractous.office.ZipUtil
import extractous.text.{Normalize, TextEmitter, XmlEmitter}

/** EPUB extraction — zip + OPF + XHTML, all on existing plumbing (the
  * reference covers EPUB through Tika, /root/reference/README.md:14).
  *
  * Real spine handling, not an alphabetical entry walk: META-INF/container.xml
  * names the OPF, the OPF's manifest maps ids → hrefs and its spine fixes the
  * reading order — chapters emit in SPINE order even when the zip stores them
  * otherwise (the fixture deliberately stores them reversed). dc:title lands
  * in metadata. Structural violations fail the row with a status.
  */
object EpubExtractor {
  val Mime = "application/epub+zip"

  private def attr(e: HElem, name: String): Option[String] =
    e.attrs.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

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
      val container = entries.getOrElse("META-INF/container.xml",
        throw new IllegalArgumentException("no META-INF/container.xml"))
      val containerDom = HtmlDom.parse(new String(container, java.nio.charset.StandardCharsets.UTF_8))
      val opfPath = findAll(containerDom, "rootfile").headOption.flatMap(attr(_, "full-path"))
        .getOrElse(throw new IllegalArgumentException("container.xml names no rootfile"))
      val opfDir = opfPath.lastIndexOf('/') match {
        case -1 => ""
        case i  => opfPath.substring(0, i + 1)
      }
      val opf = HtmlDom.parse(new String(
        entries.getOrElse(opfPath, throw new IllegalArgumentException(s"missing OPF $opfPath")),
        java.nio.charset.StandardCharsets.UTF_8))
      val hrefById = findAll(opf, "item").flatMap(i =>
        for (id <- attr(i, "id"); href <- attr(i, "href")) yield id -> href).toMap
      val spine = findAll(opf, "itemref").flatMap(attr(_, "idref"))
      if (spine.isEmpty) throw new IllegalArgumentException("OPF has no spine")
      val title = findAll(opf, "title").headOption.map(t => Normalize.line(textOf(t)))

      val emitter = new TextEmitter(cfg.maxStringLength)
      val xe = new XmlEmitter(cfg.maxStringLength, cfg.xmlOutput)
      spine.iterator.takeWhile(_ => !emitter.isFull).foreach { idref =>
        val href = hrefById.getOrElse(idref,
          throw new IllegalArgumentException(s"spine idref '$idref' not in manifest"))
        val chapter = entries.getOrElse(opfDir + href,
          throw new IllegalArgumentException(s"missing chapter ${opfDir + href}"))
        val dom = HtmlDom.parse(new String(chapter, java.nio.charset.StandardCharsets.UTF_8))
        def walk(n: HNode): Unit = n match {
          case e: HElem if Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "li")(Normalize.lowerAscii(e.name)) =>
            val t = Normalize.line(textOf(e))
            if (t.nonEmpty && !emitter.isFull) {
              emitter.addBlock(t)
              if (cfg.xmlOutput) {
                val nm = Normalize.lowerAscii(e.name)
                xe.addElement(if (nm.startsWith("h")) nm else "p", t)
              }
            }
          case e: HElem => e.children.foreach(walk)
          case _ =>
        }
        walk(dom)
      }
      val meta = Map("Content-Type" -> Seq(Mime)) ++ title.map("dc:title" -> Seq(_))
      ExtractResult.ok(emitter.result(), if (cfg.xmlOutput) xe.result() else "", meta, Mime)
    } catch {
      case e: Exception =>
        ExtractResult.fail(ExtractStatus.ExtractionFailed, s"epub: ${e.getMessage}", Mime)
    }
  }
}
