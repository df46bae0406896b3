package extractous

import extractous.core.{Wet, WarcExtractor, Extract}
import extractous.config.ExtractorConfig
import extractous.jobs.WetSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WET sidecar export: framing, kernel/core bit-identity, file sink +
  * lineage, and the full emit→re-ingest round trip.
  */
class WetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val date = "2025-03-05T12:34:56Z"

  test("record framing: CRLF header block, octet Content-Length, deterministic id") {
    val rec = Wet.recordString("https://a.example/x", date, "héllo wörld")
    val lines = rec.split("\r\n", -1)
    assert(lines(0) == "WARC/1.0")
    assert(lines(1) == "WARC-Type: conversion")
    assert(lines(2) == "WARC-Target-URI: https://a.example/x")
    assert(lines(3) == s"WARC-Date: $date")
    assert(lines(4).matches("WARC-Record-ID: <urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}>"))
    assert(lines(5) == "Content-Type: text/plain")
    // "héllo wörld" = 11 chars, 13 UTF-8 octets — Content-Length counts octets
    assert(lines(6) == "Content-Length: 13")
    assert(lines(7) == "")
    assert(lines(8) == "héllo wörld")
    // deterministic: same inputs, same record; different date, different id
    assert(rec == Wet.recordString("https://a.example/x", date, "héllo wörld"))
    assert(Wet.recordId("u", "d1") != Wet.recordId("u", "d2"))
  }

  test("wet_record kernel is bit-identical to the core framing (unicode, empty, astral)") {
    import spark.implicits._
    val texts = Seq("", "plain ascii", "héllo wörld", "tab\tand\nnewline",
      "astral 😀 pair", "的 一 是", "x" * 5000)
    val df = texts.zipWithIndex.map { case (t, i) => (s"https://h/$i", date, t) }
      .toDF("url", "d", "text")
    val got = df.select(extractous.spark.wet.wet_record(col("url"), col("d"), col("text")))
      .collect().map(_.getString(0))
    val want = texts.zipWithIndex.map { case (t, i) => Wet.recordString(s"https://h/$i", date, t) }
    assert(got.toSeq == want)
  }

  test("re-ingest: a .warc.wet.gz (warcinfo + conversion members) yields the text back") {
    val text = "Document 7\nsecond line of extracted text"
    val bytes = Wet.gzMember(Wet.warcinfo("f.warc.wet.gz", date)) ++
      Wet.gzMember(Wet.recordBytes("https://a.example/7", date, text))
    val r = Extract(bytes)
    assert(r.status == 0, r.error)
    assert(r.contentType == "application/warc")
    assert(r.text == text)
    // structural check on the uncompressed walk: warcinfo + conversion
    val recs = WarcExtractor.records(Extract.gunzip(bytes, maxOut = 1 << 20))
    assert(recs.map(_.warcType) == Seq("warcinfo", "conversion"))
    assert(recs(1).targetUri == "https://a.example/7")
    assert(new String(recs(1).block, java.nio.charset.StandardCharsets.UTF_8) == text)
  }

  test("sink: per-partition .warc.wet.gz files + lineage; full file round-trips") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("wetsink").toString
    val rows = (0L until 40L).map(i => (s"https://h${i % 4}.example/d$i", date, s"text body $i"))
    val df = rows.toDF("url", "date", "text").repartition(3)
    val lineage = WetSink.write(df, outDir, date).collect()
    // one file per non-empty partition; records sum to the input
    assert(lineage.map(_.getLong(2)).sum == 40L)
    assert(lineage.forall(_.getString(4) == extractous.model.ExtractResult.Version))
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(outDir)).iterator()
    val wetFiles = Iterator.continually(files).takeWhile(_.hasNext).map(_.next())
      .filter(_.toString.endsWith(".warc.wet.gz")).toSeq
    assert(wetFiles.size == lineage.length)
    // each file: leading warcinfo, then one conversion record per row, and
    // re-ingesting through the extractor returns every text (order kept)
    val allTexts = wetFiles.sortBy(_.toString).flatMap { f =>
      val raw = Extract.gunzip(java.nio.file.Files.readAllBytes(f), maxOut = 1 << 24)
      val recs = WarcExtractor.records(raw)
      assert(recs.head.warcType == "warcinfo")
      assert(recs.tail.forall(_.warcType == "conversion"))
      val r = Extract(java.nio.file.Files.readAllBytes(f))
      assert(r.status == 0, r.error)
      recs.tail.map(rc => new String(rc.block, java.nio.charset.StandardCharsets.UTF_8))
    }
    assert(allTexts.sorted == rows.map(_._3).sorted)
  }
}
