package extractous

import extractous.core.Extract
import extractous.gen.CorpusGen
import extractous.jobs.{CorpusWriter, ExtractJob}
import extractous.table.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot table + resumable job: atomic commits, manifest-driven reads,
  * time travel, idempotent resume, per-partition lineage (north rule).
  */
class TableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val corpusDir: String = {
    val p = java.nio.file.Files.createTempDirectory("jobcorpus").toString
    CorpusWriter.write(spark, sf, p)
    p
  }

  test("compaction rewrites fragmented days; expire squashes history and GCs orphans") {
    val tableDir = java.nio.file.Files.createTempDirectory("tablec").toString
    // groupSize=5 → 6 snapshots; salt=true repartitions by url so each day is
    // written by several tasks → several part files per day (the small-files
    // problem compaction exists for)
    val s = ExtractJob.run(spark, corpusDir, tableDir, groupSize = 5, salt = true)
    assert(s.snapshots.size == 6)
    val table = new SnapshotTable(tableDir)
    val before = table.read(spark).orderBy("url").select("url", "text", "status")
      .collect().toSeq
    val filesBefore = table.allFiles().size
    val preCompactionSnap = table.currentSnapshotId.get

    val cid = table.compact(spark)
    assert(cid > preCompactionSnap)
    // every day collapsed to one file (tiny table, one output file per day)
    assert(table.allFiles().size == 30, s"expected 30 files, got ${table.allFiles().size}")
    assert(filesBefore > 30)
    // read-back identical after compaction
    val after = table.read(spark).orderBy("url").select("url", "text", "status").collect().toSeq
    assert(after == before)
    // time travel to the pre-compaction snapshot still sees the fragments
    assert(table.allFiles(Some(preCompactionSnap)).size == filesBefore)
    assert(table.read(spark, asOf = Some(preCompactionSnap)).count() == 500)
    // resume still recognizes every day as committed (no re-extraction)
    val s2 = ExtractJob.run(spark, corpusDir, tableDir, groupSize = 5)
    assert(s2.snapshots.isEmpty && s2.docs == 0)

    // convergence: a second compact() finds nothing to shrink and is a no-op
    assert(table.compact(spark) == cid, "re-compacting a compacted table must not rewrite")

    val eid = table.expire()
    assert(table.currentSnapshotId.contains(eid))
    assert(table.chain().size == 1, "expire must squash the chain")
    // orphan fragments physically gone, visible data intact
    val dataFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(tableDir, "data"))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(dataFiles == 30, s"expected 30 data files after GC, got $dataFiles")
    val finalRows = table.read(spark).orderBy("url").select("url", "text", "status").collect().toSeq
    assert(finalRows == before)
    // lineage and status metrics survive the squash
    assert(table.chain().head.lineage.nonEmpty)
    assert(table.chain().head.status_counts.values.sum == 500)
  }

  test("merge: latest-wins upsert is one atomic snapshot; time travel crosses it; untouched days inherit") {
    import spark.implicits._
    val tableDir = java.nio.file.Files.createTempDirectory("tablem").toString
    val t = new SnapshotTable(tableDir)
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // base: 3 urls across 2 days
    val base = Seq(
      ("u/a", ts("2024-01-01"), "a v1"),
      ("u/b", ts("2024-01-01"), "b v1"),
      ("u/c", ts("2024-01-02"), "c v1")).toDF("url", "warc_ts", "text")
    t.merge(spark, base, "v1")
    val preMerge = t.currentSnapshotId.get
    val day2FilesBefore = t.visibleRelFiles().filter(_.contains("warc_day=2024-01-02"))
    // increment: recrawl u/a (later ts, SAME day), stale u/b (older ts — must
    // lose), new u/d on a new day; u/c's day is untouched
    val inc = Seq(
      ("u/a", ts("2024-01-05"), "a v2"),
      ("u/b", ts("2023-12-01"), "b STALE"),
      ("u/d", ts("2024-01-07"), "d new")).toDF("url", "warc_ts", "text")
    val mid = t.merge(spark, inc, "v2")
    assert(mid > preMerge)
    val now = t.read(spark).select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(now == Map("u/a" -> "a v2", "u/b" -> "b v1", "u/c" -> "c v1", "u/d" -> "d new"))
    // the recrawled row moved day: it lives in warc_day=2024-01-05 now
    val days = t.read(spark).filter(col("url") === "u/a")
      .select(date_format(col("warc_day"), "yyyy-MM-dd")).head.getString(0)
    assert(days == "2024-01-05")
    // time travel: the pre-merge snapshot still shows every v1 row
    val old = t.read(spark, asOf = Some(preMerge)).select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(old == Map("u/a" -> "a v1", "u/b" -> "b v1", "u/c" -> "c v1"))
    // copy-on-write scope: u/c's day had no matched/new key → its files are
    // INHERITED (identical relative paths), not rewritten
    val day2FilesAfter = t.visibleRelFiles().filter(_.contains("warc_day=2024-01-02"))
    assert(day2FilesAfter == day2FilesBefore, "untouched day must not be rewritten")
    // idempotence: re-merging the same increment changes no rows (ties favor
    // incoming, so the rewrite converges to the same content)
    t.merge(spark, inc, "v2")
    val again = t.read(spark).select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again == now)
  }

  test("expire retention window spares young orphans (racing-commit safeguard)") {
    val tableDir = java.nio.file.Files.createTempDirectory("tabler").toString
    ExtractJob.run(spark, corpusDir, tableDir, groupSize = 30)
    val table = new SnapshotTable(tableDir)
    // a racing commit's staged-but-unpublished file: renamed into data/
    // moments ago, referenced by no manifest yet
    val staged = java.nio.file.Paths.get(tableDir, "data", "warc_day=2024-01-01", "racing-commit.parquet")
    java.nio.file.Files.write(staged, Array[Byte](1, 2, 3))
    val before = table.read(spark).count()
    val eid = table.expire(olderThanMs = 3600 * 1000L)
    assert(table.currentSnapshotId.contains(eid))
    assert(table.chain().size == 1, "window must not block the squash")
    assert(java.nio.file.Files.exists(staged), "young orphan must survive the window")
    assert(table.read(spark).count() == before)
    // a later strict expire (single-writer window) collects it
    table.expire()
    assert(!java.nio.file.Files.exists(staged), "strict expire collects the orphan")
    assert(table.read(spark).count() == before)
  }

  test("full job: 3 snapshots over 30 days, output matches direct extraction") {
    val tableDir = java.nio.file.Files.createTempDirectory("table1").toString
    val s = ExtractJob.run(spark, corpusDir, tableDir, groupSize = 10)
    assert(s.snapshots == Seq(0L, 1L, 2L))
    assert(s.daysProcessed.size == 30)
    assert(s.docs == 500)

    val table = new SnapshotTable(tableDir)
    val out = table.read(spark)
    assert(out.count() == 500)
    // spot-check byte identity vs a direct in-process extraction
    import spark.implicits._
    val sample = out.select("url", "text").as[(String, String)].collect().toMap
    val seed = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)].collect().take(50)
    seed.foreach { case (id, text, lang) =>
      val expected = Extract(CorpusGen.payload(id, text, lang), CorpusGen.flagshipConfig).text
      assert(sample(CorpusGen.urlOf(id)) == expected, s"doc $id")
    }

    // resume is a no-op when everything is committed
    val s2 = ExtractJob.run(spark, corpusDir, tableDir, groupSize = 10)
    assert(s2.snapshots.isEmpty && s2.docs == 0)

    // time travel: snapshot 0 sees only the first 10 days
    val old = table.read(spark, asOf = Some(0L))
    assert(old.select("warc_day").distinct().count() == 10)
    assert(old.count() < 500)

    // lineage rows: doc counts sum to the corpus, files and version recorded
    val lineage = table.chain().flatMap(_.lineage)
    assert(lineage.map(_.doc_count).sum == 500)
    assert(lineage.forall(_.extractor_version.nonEmpty))
    assert(lineage.forall(_.input_files.nonEmpty))
    assert(lineage.map(_.bytes).sum > 0)

    // structured status metrics: ok + the corrupt codes, summing to the corpus
    val statuses = table.chain().flatMap(_.status_counts.toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(statuses.values.sum == 500)
    // corrupt ids 99,199,299,399,499: id%3==2 (299) → -2, the rest → -4
    assert(statuses("0") == 495 && statuses("-4") == 4 && statuses("-2") == 1)
  }

  test("resume after rollback recommits only missing days") {
    val tableDir = java.nio.file.Files.createTempDirectory("table2").toString
    ExtractJob.run(spark, corpusDir, tableDir, groupSize = 10)
    val table = new SnapshotTable(tableDir)
    // simulate a lost snapshot: roll CURRENT back to snapshot 0
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tableDir, "manifests", "CURRENT"), "0")
    assert(table.committedDays.size == 10)
    val s = ExtractJob.run(spark, corpusDir, tableDir, groupSize = 10)
    assert(s.daysProcessed.size == 20) // only the 20 uncommitted days
    assert(table.committedDays.size == 30)
    assert(table.read(spark).count() == 500)
  }

  test("day-range predicate prunes partitions at the scan") {
    val df = spark.read.parquet(corpusDir).filter(col("warc_day") === "2024-01-05")
    val plan = df.queryExecution.executedPlan.toString
    // partition pruning shows up as a partition filter, not a data filter
    assert(plan.contains("PartitionFilters") && plan.contains("warc_day"), plan)
    assert(df.count() > 0)
  }

  test("extraction hot path in the job has no shuffle (salt off)") {
    val slice = spark.read.parquet(corpusDir).filter(col("warc_day") <= "2024-01-03")
    val out = extractous.spark.functions.extractFrame(slice, CorpusGen.flagshipConfig, keep = Seq("warc_day"))
      .withColumn("part_id", spark_partition_id())
      .withColumn("input_file", input_file_name())
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hot path must stay narrow:\n$plan")
  }

  test("verification diff: produced table matches the generator-golden exactly") {
    import spark.implicits._
    val tableDir = java.nio.file.Files.createTempDirectory("tablediff").toString
    ExtractJob.run(spark, corpusDir, tableDir, groupSize = 30)
    val produced = new SnapshotTable(tableDir).read(spark)
    val golden = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .map { case (id, text, lang) =>
        (CorpusGen.urlOf(id), CorpusGen.expectedText(id, text, lang))
      }.toDF("url", "text")
    val s2 = extractous.jobs.DiffJob.summarize(spark, produced, golden)
    assert(s2.matched == 500 && s2.mismatched == 0 && s2.missing == 0 && s2.unexpected == 0)
  }

  test("host skew exists in the corpus and salted repartition balances it") {
    val corpus = spark.read.parquet(corpusDir)
    val hostCounts = corpus
      .groupBy(regexp_extract(col("url"), "host-(\\d+)", 1).as("host"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // generator gives host-0 ~50% of pages — a real hot-host profile
    assert(hostCounts("0") > 200 && hostCounts.size == 10)

    val parts = corpus.repartition(8, col("url"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").count().collect().map(_.getLong(1))
    assert(parts.length == 8)
    assert(parts.max.toDouble / parts.min <= 1.5,
      s"salted partitions unbalanced: ${parts.mkString(",")}")
  }

  test("salted job (salt=true) produces the same committed rows") {
    val t1 = java.nio.file.Files.createTempDirectory("tsalt1").toString
    val t2 = java.nio.file.Files.createTempDirectory("tsalt2").toString
    ExtractJob.run(spark, corpusDir, t1, groupSize = 30, salt = false)
    ExtractJob.run(spark, corpusDir, t2, groupSize = 30, salt = true)
    import spark.implicits._
    val a = new SnapshotTable(t1).read(spark).select("url", "text", "status")
      .as[(String, String, Int)].collect().toSet
    val b = new SnapshotTable(t2).read(spark).select("url", "text", "status")
      .as[(String, String, Int)].collect().toSet
    assert(a == b)
    // provenance survives the salt repartition: input_file_name() returns ""
    // once rows cross an exchange, so it must be stamped pre-shuffle
    val lineage = new SnapshotTable(t2).chain().head.lineage
    assert(lineage.nonEmpty)
    val files = lineage.flatMap(_.input_files)
    assert(files.nonEmpty && files.forall(f => f.nonEmpty && f.contains("parquet")),
      s"salted lineage lost input files: ${files.take(3)}")
  }

  test("readers ignore uncommitted orphan files") {
    val tableDir = java.nio.file.Files.createTempDirectory("table3").toString
    val s = ExtractJob.run(spark, corpusDir, tableDir, groupSize = 30)
    assert(s.snapshots == Seq(0L))
    val table = new SnapshotTable(tableDir)
    val before = table.read(spark).count()
    // drop an orphan parquet file into a data dir — a crashed writer remnant
    val day = java.nio.file.Paths.get(tableDir, "data").toFile.listFiles().head
    val orphanSrc = day.listFiles().head
    java.nio.file.Files.copy(orphanSrc.toPath, day.toPath.resolve("orphan-not-committed.parquet"))
    assert(table.read(spark).count() == before, "manifest-driven read must ignore orphans")
  }
}
