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
    spark.stop()
  }
}
