package extractous

import extractous.core.{Extract, WarcExtractor}
import extractous.gen.CorpusGen
import extractous.model.ExtractStatus
import extractous.sniff.MimeSniffer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC (ISO 28500) — the Common-Crawl container: record walk, HTTP entity
  * decoding (chunked framing, gzip Content-Encoding), per-record-gzip-member
  * files, the `warc_records` ingest expression, and the never-throw posture
  * under mutation.
  */
class WarcSpec extends AnyFunSuite {
  private val text = "the quick brown fox jumps over the lazy dog"
  private val stop = CorpusGen.stopLine("en")

  private def expected(id: Long) =
    s"Document $id\n$stop\n$text\n$text\nCrawl note $id"

  test("record walk: 5 records, types and URIs in file order") {
    val recs = WarcExtractor.records(CorpusGen.warcPayload(2, text, "en"))
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response", "conversion", "response"))
    assert(recs(2).targetUri == "https://host-2.example/doc/2") // angle brackets stripped
    assert(recs(4).targetUri == "https://host-2.example/doc/2note")
    assert(recs(2).contentType.startsWith("application/http"))
  }

  test("plain .warc extracts responses + conversion, skips warcinfo/request") {
    val r = Extract(CorpusGen.warcPayload(2, text, "en")) // (2/100)%2==0 → plain
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == expected(2))
    assert(r.contentType == MimeSniffer.Warc)
    assert(r.metadata("warc:record-count") == Seq("5"))
    assert(r.metadata("warc:response-count") == Seq("2"))
  }

  test("gzip Content-Encoding body (id%3==0) decodes identically") {
    val r = Extract(CorpusGen.warcPayload(6, text, "en"))
    assert(r.status == ExtractStatus.Ok && r.text == expected(6))
  }

  test("per-record gzip members (.warc.gz) inflate as one stream and re-sniff as WARC") {
    val r = Extract(CorpusGen.warcPayload(102, text, "en")) // (102/100)%2==1 → gz members
    assert(r.status == ExtractStatus.Ok)
    assert(r.text == expected(102))
    assert(r.metadata("Content-Encoding") == Seq("gzip"))
  }

  test("chunked transfer-encoding is de-chunked exactly") {
    val body = WarcExtractor.httpBody(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n6\r\nCrawl \r\n7\r\nnote 42\r\n0\r\n\r\n".getBytes)
    assert(new String(body, "UTF-8") == "Crawl note 42")
  }

  test("structural corruption fails the row with a status, never wrong text") {
    val good = CorpusGen.warcPayload(2, text, "en")
    // truncate mid-block: the last record's Content-Length overruns the file
    val r = Extract(java.util.Arrays.copyOf(good, good.length - 10))
    assert(r.status == ExtractStatus.ExtractionFailed && r.text == "")
    // bad version line
    val mut = good.clone(); mut(3) = 'X'.toByte
    val r2 = Extract(mut)
    assert(r2.text != expected(2)) // never silently the right text from a corrupt container
  }

  test("mutation fuzz: 400 single-byte mutants never throw out of Extract") {
    val good = CorpusGen.warcPayload(7, text, "en")
    val rnd = new scala.util.Random(43)
    (0 until 400).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Extract(m) // must not throw; any status acceptable
    }
  }

  test("warc_records expression: good file → decoded entities; corruption → accounted, not silent") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val good = CorpusGen.warcRecords(11, text, "en").flatMap(r => CorpusGen.gzMember(r)).toArray
    val bad = "WARC/1.0\r\nbroken".getBytes
    // torn tail: two docs' records, last record truncated mid-block — the
    // good prefix must survive with the loss accounted as a file_error row
    val torn = {
      val all = CorpusGen.warcRecords(1, text, "en") ++ CorpusGen.warcRecords(2, text, "en")
      val flat = all.flatMap(r => r).toArray
      java.util.Arrays.copyOf(flat, flat.length - 10)
    }
    val df = Seq(("good", good), ("bad", bad), ("torn", torn), ("empty", Array.emptyByteArray))
      .toDF("name", "payload")
      .select(col("name"), extractous.spark.functions.warc_records(col("payload")).as("recs"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(rows("bad").map(_.getString(2)) == Seq("file_error"))
    assert(rows("empty").map(_.getString(2)) == Seq("file_error")) // 0-byte file accounted too
    val recs = rows("good")
    assert(recs.length == 3) // 2 responses + 1 conversion; warcinfo/request dropped
    assert(recs.map(_.getString(2)).toSet == Set("response", "conversion"))
    val htmlRec = recs.find(r => r.getString(0) == "https://host-4.example/doc/11").get
    assert(MimeSniffer.sniff(htmlRec.getAs[Array[Byte]]("payload")) == MimeSniffer.Html)
    // torn file: doc-1's 3 rows + doc-2's first response survive, + file_error
    val t = rows("torn").map(_.getString(2))
    assert(t.last == "file_error", s"loss must be accounted: $t")
    assert(t.count(_ == "response") >= 3, s"good prefix must survive: $t")
  }

  test("crawl → corpus table → extract table, end to end") {
    val spark = SparkTestSession.spark
    val warcDir = java.nio.file.Files.createTempDirectory("warcsrc")
    // two crawl files, two docs each, per-record gzip members
    Seq(Seq(20L, 21L), Seq(22L, 23L)).zipWithIndex.foreach { case (ids, i) =>
      val out = new java.io.ByteArrayOutputStream()
      ids.foreach { id =>
        CorpusGen.warcRecords(id, text, "en").foreach(r => out.write(CorpusGen.gzMember(r)))
      }
      java.nio.file.Files.write(warcDir.resolve(f"crawl-$i.warc.gz"), out.toByteArray)
    }
    val corpusDir = java.nio.file.Files.createTempDirectory("warccorpus").toString
    val stats = extractous.jobs.WarcIngest.recordStats(spark, s"$warcDir/*.warc.gz")
    assert(stats == Map("response" -> 8L, "conversion" -> 4L)) // zero losses accounted
    val n = extractous.jobs.WarcIngest.run(spark, s"$warcDir/*.warc.gz", corpusDir)
    assert(n == 12) // 4 docs × (2 responses + 1 conversion)
    val tableDir = java.nio.file.Files.createTempDirectory("warctable").toString
    val summary = extractous.jobs.ExtractJob.run(spark, corpusDir, tableDir, groupSize = 10)
    assert(summary.docs == 12)
    val got = new extractous.table.SnapshotTable(tableDir).read(spark)
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("https://host-6.example/doc/20") == s"Document 20\n$stop\n$text")
    assert(got("https://host-6.example/doc/20note") == "Crawl note 20")
  }

  test("ingest plan is narrow: binaryFile scan → generate → project, no Exchange before the sink") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("warcplan")
    val bytes = CorpusGen.warcRecords(5, text, "en").flatMap(r => CorpusGen.gzMember(r)).toArray
    java.nio.file.Files.write(tmp.resolve("f.warc.gz"), bytes)
    val plan = spark.read.format("binaryFile").load(s"$tmp/*.warc.gz")
      .select(explode(extractous.spark.functions.warc_records(col("content"))).as("rec"))
      .filter(col("rec.rec_type") === "response")
      .select(col("rec.url"), extractous.spark.functions.extract_doc(col("rec.payload")).as("r"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ingest hot path must not shuffle:\n$plan")
  }
}
