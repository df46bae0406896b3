package extractous.jobs

import extractous.config.ExtractorConfig
import extractous.gen.CorpusGen
import extractous.model.ExtractResult
import extractous.spark.{functions => xf}
import extractous.table.{LineageRow, SnapshotTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production extraction job (spark-submit entry): corpus table in →
  * extracted table out, resumable from snapshot checkpoints.
  *
  * Scale design (north rule):
  *   - input is a `warc_day`-partitioned table; every pass carries a day
  *     predicate, so Catalyst partition pruning keeps unread days off disk;
  *   - the hot path is scan → project(extract_doc) → write: NO shuffle. Skew
  *     and memory budgeting are handled at the file level
  *     (`spark.sql.files.maxPartitionBytes` caps bytes/task for the
  *     binary-heavy html column) — not by repartitioning extracted rows;
  *   - optional `salt`: pre-extraction repartition by hash(url), for runs that
  *     need output files balanced despite host-skewed inputs (host-0 carries
  *     ~50% of pages in the synthetic corpus). Off by default because it adds
  *     the only shuffle in the pipeline;
  *   - work is committed in groups of `groupSize` days: each group = one
  *     atomic snapshot with per-partition lineage rows. A restarted job skips
  *     every committed day (idempotent resume);
  *   - provenance columns (`part_id`, `input_file`) ride in the output table;
  *     lineage aggregates are computed from the staged output (narrow re-read
  *     of 3 columns), not by a second pass over the raw corpus.
  */
object ExtractJob {

  final case class JobSummary(snapshots: Seq[Long], daysProcessed: Seq[String], docs: Long)

  def run(spark: SparkSession, inputDir: String, tableDir: String,
      cfg: ExtractorConfig = CorpusGen.flagshipConfig,
      groupSize: Int = 10, salt: Boolean = false,
      fromDay: Option[String] = None, toDay: Option[String] = None): JobSummary = {
    val table = new SnapshotTable(tableDir)
    table.init()
    val input0 = spark.read.parquet(inputDir)
    val input = (fromDay, toDay) match {
      case (Some(f), Some(t)) => input0.filter(col("warc_day") >= f && col("warc_day") <= t)
      case (Some(f), None)    => input0.filter(col("warc_day") >= f)
      case (None, Some(t))    => input0.filter(col("warc_day") <= t)
      case _                  => input0
    }

    // sweep staging dirs orphaned by a crash between write and commit: a
    // fresh run stages anew, so anything still named .staging-* is provably
    // garbage (committed data lives under data/, referenced by the manifest)
    // — without this, each retry of a flaky group leaks a full-size copy.
    // Safe under the table's documented single-writer assumption (see
    // SnapshotTable.expire), which a concurrent-writer deployment must not
    // violate here either.
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(tableDir)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(".staging-"))
        .foreach { stale =>
          java.nio.file.Files.walk(stale).iterator().asScala
            .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
        }
    } catch { case _: Exception => () }

    val committed = table.committedDays
    // partition dirs read back as DATE; compare/collect as canonical strings
    val allDays = input.select(date_format(col("warc_day"), "yyyy-MM-dd"))
      .distinct().collect().map(_.getString(0)).sorted
    val todo = allDays.filterNot(committed)

    val snapshots = Seq.newBuilder[Long]
    var totalDocs = 0L
    todo.grouped(groupSize).foreach { group =>
      // provenance stamped BEFORE any repartition: input_file_name() returns
      // "" once rows cross an exchange, which would silently blank lineage
      val slice0 = input.filter(col("warc_day").isin(group: _*))
        .withColumn("input_file", input_file_name())
      val slice = if (salt) slice0.repartition(spark.sparkContext.defaultParallelism, col("url")) else slice0
      val out = xf.extractFrame(slice, cfg, keep = Seq("warc_day", "input_file"))
        .withColumn("part_id", spark_partition_id())
        .withColumn("n_bytes", octet_length(col("text")))
      // stage INSIDE the table dir: the commit's ATOMIC_MOVE renames are then
      // guaranteed same-filesystem (a /tmp staging dir on another mount would
      // throw AtomicMoveNotSupportedException)
      val staging = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(tableDir), ".staging-").toString
      out.write.mode("overwrite").partitionBy("warc_day").parquet(staging)

      // lineage + status metrics from the staged output: pruned 4-column read
      // (never touches the text column again), two small aggregates
      val staged = spark.read.parquet(staging).select("part_id", "input_file", "n_bytes", "status")
      val lineage = staged
        .groupBy(col("part_id"))
        .agg(collect_set(col("input_file")).as("input_files"),
          count(lit(1)).as("doc_count"),
          sum(col("n_bytes")).as("bytes"))
        .collect()
        .map(r => LineageRow(r.getInt(0), r.getSeq[String](1).sorted, r.getLong(2), r.getLong(3),
          ExtractResult.Version))
        .sortBy(_.partition_id).toSeq
      val statusCounts = staged.groupBy(col("status")).count().collect()
        .map(r => r.getInt(0).toString -> r.getLong(1)).toMap
      totalDocs += lineage.map(_.doc_count).sum
      snapshots += table.commit(staging, group.toSeq, lineage, ExtractResult.Version, statusCounts)
      // drop the drained staging dir (only _SUCCESS/empty day dirs remain)
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(staging)).iterator().asScala
          .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Exception => () }
    }
    JobSummary(snapshots.result(), todo.toSeq, totalDocs)
  }

  /** spark-submit entry: ExtractJob <inputDir> <tableDir> [groupSize] [salt] */
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val tableDir = args(1)
    val groupSize = if (args.length > 2) args(2).toInt else 10
    val salt = args.length > 3 && args(3).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("extractous-extract-job")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // binary-column size-aware budgeting: bound bytes per task so payload-
      // heavy partitions fit executor memory at any scale
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "67108864"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, inputDir, tableDir, groupSize = groupSize, salt = salt)
    println(s"[extract-job] snapshots=${s.snapshots.mkString(",")} days=${s.daysProcessed.size} docs=${s.docs}")
    spark.stop()
  }
}

/** Materializes the deterministic corpus as a `warc_day`-partitioned parquet
  * table (the job/bench input). Optional replication factor scales the corpus
  * for benchmarking (urls get a replica suffix; payloads identical per doc).
  */
object CorpusWriter {
  /** `replicate` multiplies row count; `fatten` multiplies per-page text size
    * (bench realism: real crawl pages are 20-100 KB, the seed texts ~0.3 KB).
    */
  def write(spark: SparkSession, sfDir: String, outDir: String, replicate: Int = 1,
      fatten: Int = 1): Long = {
    import spark.implicits._
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docsDf =
      if (fatten <= 1) docs0
      else docs0.withColumn("text",
        concat_ws(" ", array_repeat(col("text"), fatten)))
    val base = CorpusGen.corpusFrom(docsDf).toDF()
      .withColumn("warc_day", date_format(col("warc_ts"), "yyyy-MM-dd"))
    val corpus =
      if (replicate <= 1) base
      else base.crossJoin(spark.range(replicate).select(col("id").as("replica")))
        .withColumn("url", concat(col("url"), lit("#r"), col("replica")))
        .drop("replica")
    // File layout (guide §6): the replicated bench corpus is split into
    // several files per day so the downstream scan has ≥ 2 waves of tasks per
    // core — one file per day yields exactly `days` splits, which under-fills
    // any cluster with more cores than days and lets the largest day gate the
    // stage. The per-day file count derives from the cluster's parallelism
    // (scale-adaptive, not a local-mode constant); the salt is deterministic
    // (url hash, never rand() — see SPARK-38388). The unreplicated corpus
    // (oracle/Verify scale) keeps the one-file-per-day layout of a real
    // day-partitioned crawl table.
    if (replicate <= 1) {
      corpus.repartition(col("warc_day"))
        .write.mode("overwrite").partitionBy("warc_day").parquet(outDir)
    } else {
      val days = math.max(1L, base.select("warc_day").distinct().count())
      val filesPerDay = math.max(1L, math.min(32L,
        (6L * spark.sparkContext.defaultParallelism + days - 1) / days))
      corpus.repartition((days * filesPerDay).toInt, col("warc_day"),
          pmod(xxhash64(col("url")), lit(filesPerDay)))
        .write.mode("overwrite").partitionBy("warc_day").parquet(outDir)
    }
    spark.read.parquet(outDir).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val replicate = if (args.length > 2) args(2).toInt else 1
    val fatten = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = write(spark, sfDir, outDir, replicate, fatten)
    println(s"[corpus-writer] wrote $n pages to $outDir")
    spark.stop()
  }
}
