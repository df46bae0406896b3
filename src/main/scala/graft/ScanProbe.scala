package graft

import extractous.gen.CorpusGen
import extractous.spark.{functions => xf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (not part of the driver contract): decomposes x_extract's
  * wall time into scan-only, scan+copy, and scan+extract, and reports scan
  * task counts — to locate where parquet-path extraction time goes.
  */
object ScanProbe {
  private def force(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/benchcorpus_r06")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(corpusDir)
    println(s"[probe] scan partitions = ${corpus.select(col("url"), col("html")).rdd.getNumPartitions}")
    (1 to 3).foreach { i =>
      val tScan = time(force(corpus.select(col("url"), col("html"))))
      val tLen = time(force(corpus.select(col("url"), octet_length(col("html")))))
      val tSniff = time(force(corpus.select(col("url"), xf.sniff_mime(col("html")))))
      val tExtract = time(force(xf.extractFrame(corpus, CorpusGen.flagshipConfig)
        .select("url", "text", "status")))
      println(f"[probe] rep$i scan=$tScan%.2f len=$tLen%.2f sniff=$tSniff%.2f extract=$tExtract%.2f")
    }
    spark.stop()
  }
}
