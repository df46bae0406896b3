package graft

import extractous.gen.CorpusGen
import extractous.jobs.CorpusWriter
import extractous.pipeline.{Decontam, Dedup, Similarity, TextStats}
import extractous.spark.{functions => xf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement-only companion to [[Bench]] (guide §1.4): times the SAME query
  * formulations with the noop sink under the SAME session config, but supports
  *   - corpus-dir reuse across invocations (SPARK_GRAFT_CORPUS_DIR) so a query
  *     iteration loop doesn't pay the multi-GB corpus build each time,
  *   - a query subset (SPARK_GRAFT_ONLY=a,b,c),
  *   - configurable reps (SPARK_GRAFT_BENCH_REPS, default 3; reported min),
  *   - plan dumps (SPARK_GRAFT_EXPLAIN_DIR: writes <query>.txt explain output),
  *   - optional headline proxy (SPARK_GRAFT_EXTRACT_CACHED=1: extraction over
  *     a MEMORY_ONLY-cached corpus like Bench's thread-scaling leg).
  * NOT part of the driver contract; Bench.scala remains the measured harness.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def force(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "30").toInt
    val fatten = sys.env.getOrElse("SPARK_GRAFT_BENCH_FATTEN", "80").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val doCached = sys.env.get("SPARK_GRAFT_EXTRACT_CACHED").contains("1")

    // corpus: reuse a prebuilt dir when given and non-empty, else build fresh
    val corpusDir = sys.env.get("SPARK_GRAFT_CORPUS_DIR") match {
      case Some(d) if java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)) &&
          java.nio.file.Files.list(java.nio.file.Paths.get(d)).findAny().isPresent => d
      case Some(d) =>
        val s = session(cpus)
        CorpusWriter.write(s, sfDir, d, replicate, fatten)
        s.stop(); d
      case None =>
        val d = java.nio.file.Files.createTempDirectory("benchextracorpus").toString
        val s = session(cpus)
        CorpusWriter.write(s, sfDir, d, replicate, fatten)
        s.stop(); d
    }
    try { new ProcessBuilder("sync").start().waitFor(); Thread.sleep(2000) }
    catch { case _: Exception => () }

    val spark = session(cpus)
    val corpus = spark.read.parquet(corpusDir)
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val embsDf = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // identical formulations to Bench.scala's timing list
    val frames = Seq[(String, () => DataFrame)](
      "x_extract" -> (() => xf.extractFrame(corpus, CorpusGen.flagshipConfig)
        .select("url", "text", "status")),
      "x_sniff" -> (() => corpus.select(col("url"), xf.sniff_mime(col("html")))),
      "d_dedup_hash" -> (() => Dedup.byHash(docsDf, "text", "doc_id")),
      "d_minhash_lsh" -> (() => Dedup.minhashNearDups(docsDf, "doc_id", "text", 0.8)),
      "d_simhash" -> (() => Dedup.simhashNearDups(docsDf, "doc_id", "text", 3)),
      "s_knn_brute" -> (() => Similarity.bruteKnn(embsDf, embsDf.filter(col("vec_id") < 20), 5)),
      "s_knn_ivf" -> (() => Similarity.ivfKnn(embsDf, embsDf.filter(col("vec_id") < 20), 5, 3)),
      "t_fingerprint" -> (() => docsDf.select(TextStats.fingerprint(col("text")))),
      "d_decontam" -> (() => Decontam.flag(docsDf,
        docsDf.filter(col("doc_id") % 50 === 0).select("text"), "text", "doc_id", n = 3)),
      "t_gopher" -> (() => docsDf.select(col("doc_id") +:
        TextStats.gopherReport(col("text"), minWords = 10).map { case (n, c) => c.as(n) }: _*)),
      "t_repetition" -> (() => docsDf.select(col("doc_id") +:
        TextStats.repetitionReport(col("text")).map { case (n, c) => c.as(n) }: _*)),
      "d_split" -> (() => extractous.pipeline.Sampling.split(docsDf, "text")),
      "d_robots" -> (() => SparkEntry.queries("d_robots")(spark, sfDir)),
      "d_dedup_substr" -> (() => Dedup.substringFlags(docsDf, "text", "doc_id", k = 8)),
      "t_tokens_bpe" -> (() => docsDf.select(extractous.pipeline.Bpe.countTokens(col("text")))),
      "t_langid" -> (() => SparkEntry.queries("t_langid")(spark, sfDir)),
      "d_dsir" -> (() => SparkEntry.queries("d_dsir")(spark, sfDir)),
      "s_semdedup" -> (() => SparkEntry.queries("s_semdedup")(spark, sfDir)),
      "s_cms" -> (() => SparkEntry.queries("s_cms")(spark, sfDir)),
      "d_resample" -> (() => SparkEntry.queries("d_resample")(spark, sfDir)),
      "s_quantiles" -> (() => SparkEntry.queries("s_quantiles")(spark, sfDir)),
      "t_entropy" -> (() => docsDf.select(col("doc_id") +:
        TextStats.entropyReport(col("text")).map { case (n, c) => c.as(n) }: _*)),
      "t_normalize" -> (() => docsDf.select(col("doc_id") +:
        TextStats.normalizeReport(col("text")).map { case (n, c) => c.as(n) }: _*)),
      "s_bm25" -> (() => extractous.pipeline.Retrieval.bm25(
        docsDf, "text", "doc_id", Seq("query", "vector", "stream"))),
      "d_jaccard" -> (() => Dedup.jaccardNearDups(docsDf, "doc_id", "text", 0.8)),
      "s_heavyhitters" -> (() =>
        extractous.pipeline.CorpusStats.heavyHitters(docsDf, "text", fraction = 100))
    ).filter { case (n, _) => only.forall(_.contains(n)) }

    explainDir.foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      frames.foreach { case (name, f) =>
        val plan = f().queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"), plan)
      }
      System.err.println(s"[benchextra] plans written to $d")
    }

    val timings = frames.map { case (name, f) =>
      spark.sparkContext.setJobDescription(name)
      val samples = (1 to reps).map(_ => time(force(f()))._2)
      spark.sparkContext.setJobDescription(null)
      System.err.println(f"[benchextra] $name%-16s min=${samples.min}%7.3f  all=${samples.map(s => f"$s%.3f").mkString(",")}")
      name -> samples.min
    }

    // exec-scaling pairs replica (same worker protocol as Bench.launchWorkers)
    // for fast efficiency iteration without the full 20-minute harness
    sys.env.get("SPARK_GRAFT_PAIRS_EXTRA").map(_.toInt).filter(_ > 0).foreach { pairCount =>
      import scala.jdk.CollectionConverters._
      val smallCpus = math.max(1, cpus / 8)
      val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(corpusDir)).iterator().asScala
        .map(_.toString).filter(_.contains("warc_day=")).toSeq.sorted
      def dirSize(d: String): Long =
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_)).map(java.nio.file.Files.size).sum
      val bySize = dirs.map(d => (d, dirSize(d))).sortBy(-_._2)
      val sliceBuf = Array.fill(4)(Vector.newBuilder[String])
      val sliceLoad = new Array[Long](4)
      bySize.foreach { case (d, sz) =>
        val w = sliceLoad.indices.minBy(sliceLoad)
        sliceBuf(w) += d
        sliceLoad(w) += sz
      }
      val slices = sliceBuf.toSeq.map(_.result())
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val moduleArgs = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
        .asScala.toSeq.sliding(2).collect { case Seq("--add-opens", v) => Seq("--add-opens", v) }
        .flatten.toSeq
      def spawn(sliceArg: String): (Process, java.io.BufferedReader) = {
        val cmd = Seq(javaBin, "-Xms6g", "-Xmx6g", "-XX:+AlwaysPreTouch",
          "-XX:+UseParallelGC", s"-XX:ActiveProcessorCount=$smallCpus") ++ moduleArgs ++
          Seq("-cp", cp, "graft.BenchWorker", smallCpus.toString, sliceArg, "2")
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectError(ProcessBuilder.Redirect.to(java.io.File.createTempFile("bx-worker-", ".stderr")))
        val p = pb.start()
        (p, new java.io.BufferedReader(new java.io.InputStreamReader(p.getInputStream, "UTF-8")))
      }
      def awaitReady(pr: (Process, java.io.BufferedReader)): Unit = {
        var line = pr._2.readLine()
        while (line != null && !line.contains("[worker] ready")) line = pr._2.readLine()
      }
      def release(pr: (Process, java.io.BufferedReader)): Unit = {
        pr._1.getOutputStream.write('\n'); pr._1.getOutputStream.flush()
      }
      def harvest(pr: (Process, java.io.BufferedReader)): Double = {
        val sb = new StringBuilder
        var line = pr._2.readLine()
        while (line != null) { sb.append(line).append('\n'); line = pr._2.readLine() }
        pr._1.waitFor()
        "\\[worker\\] docs=(\\d+) secs=([0-9.]+)".r.findFirstMatchIn(sb.toString)
          .map(_.group(2).toDouble).getOrElse(Double.MaxValue)
      }
      def seqLeg(): Double = {
        val pr = spawn(slices.map(_.mkString(",")).mkString(";"))
        awaitReady(pr); release(pr); harvest(pr)
      }
      def parLeg(): Double = {
        val prs = slices.map(s => spawn(s.mkString(",")))
        prs.foreach(awaitReady); prs.foreach(release)
        val ts = prs.map(harvest)
        System.err.println(f"[benchextra]   par workers: ${ts.map(t => f"$t%.2f").mkString(" ")}")
        ts.max
      }
      (1 to pairCount).foreach { i =>
        val (s, p) = if (i % 2 == 1) { val a = seqLeg(); val b = parLeg(); (a, b) }
                     else { val b = parLeg(); val a = seqLeg(); (a, b) }
        System.err.println(f"[benchextra] pair$i seq=$s%.2f par=$p%.2f eff=${s / (4 * p)}%.3f")
      }
    }

    if (sys.env.get("SPARK_GRAFT_JOB").contains("1")) {
      val docs = corpus.count()
      (1 to math.max(1, reps - 1)).foreach { i =>
        val tableDir = java.nio.file.Files.createTempDirectory("benchextratable").toString
        val secs = time(extractous.jobs.ExtractJob.run(spark, corpusDir, tableDir, groupSize = 30))._2
        System.err.println(f"[benchextra] job rep$i secs=$secs%.2f tput=${docs / secs}%.0f docs/s")
      }
    }

    val cachedTput = if (doCached) {
      val cached = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val n = cached.count()
      val secs = (1 to math.max(2, reps)).map { _ =>
        time(force(xf.extractFrame(cached, CorpusGen.flagshipConfig)
          .select("url", "text", "status")))._2
      }.min
      cached.unpersist(blocking = true)
      System.err.println(f"[benchextra] extract_cached docs=$n secs=$secs%.3f tput=${n / secs}%.0f docs/s")
      n / secs
    } else 0.0

    val qJson = timings.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"benchextra","queries":$qJson,"extract_cached_docs_per_sec":${"%.1f".format(cachedTput)},"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
