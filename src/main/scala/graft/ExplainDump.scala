package graft

import extractous.gen.CorpusGen
import extractous.jobs.CorpusWriter
import extractous.pipeline.Dedup
import extractous.spark.{functions => xf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps the formatted physical plans documented in EXPLAIN.md. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusDir = java.nio.file.Files.createTempDirectory("explaincorpus").toString
    CorpusWriter.write(spark, sf, corpusDir)
    val corpus = spark.read.parquet(corpusDir)

    def dump(title: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $title =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    dump("1. extraction hot path",
      xf.extractFrame(corpus, CorpusGen.flagshipConfig, keep = Seq("warc_day")))
    dump("2. partition-pruned day read",
      corpus.filter(col("warc_day") === "2024-01-05").select(col("url"), xf.sniff_mime(col("html"))))
    dump("3. broadcast join (r_join)",
      SparkEntry.queries("r_join")(spark, sf))
    dump("4. hash dedup (short-key shuffle)",
      Dedup.byHash(spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id"))
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    dump("5. IVF knn (narrow nearest_cells assignment + topk_by_score, no windows)",
      extractous.pipeline.Similarity.ivfKnn(embs, embs.filter(col("vec_id") < 20), 5, 3))
    dump("6. banded hyperplane LSH near-dup (band-key shuffle + verify joins)",
      extractous.pipeline.Similarity.nearDupPairsLsh(embs, 0.99))

    // round-3 additions (EXPLAIN.md §8)
    val docs = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text"))
    val warcDir = java.nio.file.Files.createTempDirectory("explainwarc")
    val wbytes = new java.io.ByteArrayOutputStream()
    (0L to 2L).foreach(id => CorpusGen.warcRecords(id, "plan dump text", "en")
      .foreach(r => wbytes.write(CorpusGen.gzMember(r))))
    java.nio.file.Files.write(warcDir.resolve("f.warc.gz"), wbytes.toByteArray)
    dump("7. WARC ingest (binaryFile scan -> generate -> project, no Exchange)",
      extractous.jobs.WarcIngest.pages(spark, s"$warcDir/*.warc.gz"))
    dump("8. decontamination (broadcast gram semi-join, counts-only exchange)",
      extractous.pipeline.Decontam.flag(docs,
        docs.filter(col("doc_id") % 50 === 0).select("text"), "text", "doc_id", n = 3))
    dump("9. quality gates (one narrow codegen'd projection)",
      docs.select(col("doc_id") +:
        (extractous.pipeline.TextStats.gopherReport(col("text"), 10) ++
         extractous.pipeline.TextStats.repetitionReport(col("text"))).map { case (n, c) => c.as(n) }: _*))

    // round-4 additions (EXPLAIN.md §9)
    dump("10. substring dedup (long-keyed exchanges only, text never shuffles)",
      Dedup.substringFlags(docs, "text", "doc_id", k = 8))
    dump("11. langid + bpe + fingerprint (one narrow imperative projection)",
      docs.select(col("doc_id"),
        extractous.pipeline.LangId.predict(col("text")).as("lang"),
        extractous.pipeline.Bpe.countTokens(col("text")).as("bpe"),
        extractous.pipeline.TextStats.fingerprint(col("text")).as("fp")))

    // round-4 late additions (EXPLAIN.md §10)
    val pages = docs.select(col("doc_id"),
      concat(lit("https://host-"), (col("doc_id") % 7).cast("string"),
        lit(".example/doc/"), col("doc_id").cast("string")).as("url"),
      concat(lit("<html><body><a href=\"/x\">l</a><p>"), col("text"),
        lit("</p></body></html>")).as("html"))
    dump("12. per-domain cap (bounded-heap threshold agg + broadcast join, NO window)",
      extractous.pipeline.DomainBalance.capPerDomain(
        pages.select(col("doc_id"), col("url")), "url", "doc_id", k = 25))
    dump("13. link graph (narrow link kernel -> host-key partial agg)",
      extractous.pipeline.LinkGraph.hostInDegree(pages, "url", "html"))
    dump("14. C4 gate (one narrow codegen'd projection)",
      docs.select(col("doc_id") +:
        extractous.pipeline.TextStats.c4Report(col("text")).map { case (n, c) => c.as(n) }: _*))
    dump("15. temperature resample (host-count agg + broadcast stats, corpus never shuffles)",
      extractous.pipeline.DomainBalance.temperatureResample(
        pages.select(col("doc_id"), col("url")), "url", "doc_id", targetTotal = 100))
    val cmsSketch = extractous.pipeline.Cms.build(docs, "text", w = 1024)
    dump("16. CMS probe (zero-exchange projection against the embedded sketch)",
      extractous.pipeline.Cms.estimatePhrases(
        extractous.pipeline.Cms.candidateBigrams(docs.filter(col("doc_id") < 20), "text"),
        "w1", "w2", cmsSketch))
    dump("17. CMS build (bounded 4*W-key aggregation, sketch-sized exchange)",
      docs.select(org.apache.spark.sql.functions.explode(extractous.spark.cms.cms_slots(
        extractous.pipeline.TextStats.gramTokens(col("text")), 1024)).as("slot"))
        .groupBy("slot").count())
    dump("18. length quantiles (bounded histogram, no global sort)",
      docs.select(org.apache.spark.sql.functions.length(col("text")).cast("long").as("len"))
        .groupBy("len").count())

    // round-4 session-3 additions (EXPLAIN.md §11)
    dump("19. normalize + entropy (one narrow imperative projection)",
      docs.select(col("doc_id") +:
        (extractous.pipeline.TextStats.normalizeReport(col("text")) ++
         extractous.pipeline.TextStats.entropyReport(col("text"))).map { case (n, c) => c.as(n) }: _*))
    dump("20. BM25 retrieval (broadcast stats row + TakeOrdered top-k, no document shuffle)",
      extractous.pipeline.Retrieval.bm25(
        spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id",
        Seq("query", "vector", "stream")))
    dump("21. end-to-end corpus build (narrow stages -> ONE digest-keyed exchange)",
      SparkEntry.queries("d_corpus")(spark, sf))
    dump("22. anchor-text aggregation (narrow anchor kernel -> short-key partial count)",
      extractous.pipeline.LinkGraph.anchorTexts(pages, "url", "html"))

    // round-5 additions (EXPLAIN.md §14)
    dump("23. exact n-gram jaccard (gram inverted index, long-keyed join, no text shuffle)",
      Dedup.jaccardNearDups(docs, "doc_id", "text", threshold = 0.8))
    dump("24. sharded bloom probe (narrow zero-exchange projection, shard = f(own key))",
      SparkEntry.queries("d_dedup_bloom_sharded")(spark, sf))
    dump("25. fused quality projection (langid+gopher+c4+entropy, ONE FileScan, zero exchange)",
      docs.select(col("doc_id") +:
        extractous.pipeline.TextStats.fusedQualityReport(col("text")).map { case (n, c) => c.as(n) }: _*))
    dump("26. Feistel corpus shuffle (narrow bijection key, one balanced range exchange)",
      SparkEntry.queries("d_shuffle")(spark, sf))
    dump("27. BPE train word-count stage (map-side combined, corpus-scale only here)",
      SparkEntry.queries("d_bpe_train")(spark, sf))
    dump("28. quality-classifier margins (model embedded, narrow scoring projection)",
      SparkEntry.queries("d_quality_train")(spark, sf))
    spark.stop()
  }
}
