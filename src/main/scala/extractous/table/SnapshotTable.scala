package extractous.table

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-STYLE table layer over partitioned Parquet (no Iceberg jar exists in
  * this environment — SURVEY.md §7.0): what the north rule needs from Iceberg,
  * implemented with the same core mechanics:
  *
  *   - data files live under `data/warc_day=YYYY-MM-DD/`, readers NEVER trust
  *     directory listings — the committed manifest chain is the source of truth
  *     (orphan files from crashed writers are invisible, exactly as in Iceberg);
  *   - a snapshot = JSON manifest (id, parent, committed partitions, file list,
  *     per-partition lineage rows) committed by write-temp + atomic rename;
  *     `CURRENT` is an atomically-swapped pointer file;
  *   - time travel = read any snapshot id; incremental resume = the set of
  *     committed `warc_day` partitions in the current snapshot chain.
  *
  * The interface is deliberately narrow so a real Iceberg catalog could be
  * dropped in behind it.
  */
final case class LineageRow(
    partition_id: Int,
    input_files: Seq[String],
    doc_count: Long,
    bytes: Long,
    extractor_version: String)

final case class Manifest(
    snapshot_id: Long,
    parent_id: Long, // -1 = none
    committed_days: Seq[String],
    files: Seq[String], // relative to table root
    lineage: Seq[LineageRow],
    /** structured metrics: extraction status code → row count (reference
      * error-taxonomy observability, /root/reference/errors.go:301-316 analogue)
      */
    status_counts: Map[String, Long] = Map.empty,
    extractor_version: String)

final class SnapshotTable(val root: String) {
  private val mapper = new ObjectMapper()
  mapper.registerModule(DefaultScalaModule)
  mapper.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
  // Map[String, Long] values lose their type to erasure — deserialize all
  // integral JSON numbers as Long so unboxing the counts never CCEs
  mapper.configure(DeserializationFeature.USE_LONG_FOR_INTS, true)

  private def manifestsDir: Path = Paths.get(root, "manifests")
  private def dataDir: Path = Paths.get(root, "data")
  private def currentPtr: Path = manifestsDir.resolve("CURRENT")

  def init(): Unit = {
    Files.createDirectories(manifestsDir)
    Files.createDirectories(dataDir)
  }

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentPtr)) Some(Files.readString(currentPtr).trim.toLong) else None

  def manifest(id: Long): Manifest =
    mapper.readValue(Files.readString(manifestsDir.resolve(f"snap-$id%05d.json")), classOf[Manifest])

  /** Snapshot chain, newest first, starting at `id` (default: current). */
  def chain(id: Option[Long] = currentSnapshotId): Seq[Manifest] = {
    val out = Seq.newBuilder[Manifest]
    var cur = id
    while (cur.isDefined && cur.get >= 0) {
      val m = manifest(cur.get)
      out += m
      cur = if (m.parent_id >= 0) Some(m.parent_id) else None
    }
    out.result()
  }

  def committedDays: Set[String] = chain().flatMap(_.committed_days).toSet

  def allFiles(asOf: Option[Long] = currentSnapshotId): Seq[String] =
    chain(asOf).flatMap(_.files).map(f => Paths.get(root, f).toString)

  /** Read the table at the current (or a historical) snapshot. Partition
    * column `warc_day` is recovered from the path layout via basePath, so
    * Catalyst partition pruning applies to day-range predicates.
    */
  def read(spark: SparkSession, asOf: Option[Long] = None): DataFrame = {
    val files = allFiles(asOf.orElse(currentSnapshotId))
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", dataDir.toString).parquet(files: _*)
  }

  /** Commit one snapshot: move the staged day-partitioned parquet output under
    * data/, then atomically publish the manifest + CURRENT pointer. Readers
    * see the snapshot only after the final atomic rename — a crash at any
    * earlier point leaves invisible orphans, never a torn table.
    */
  def commit(stagingDir: String, days: Seq[String], lineage: Seq[LineageRow],
      version: String, statusCounts: Map[String, Long] = Map.empty): Long = {
    init()
    // next id = 1 + max over ALL existing manifests (not just the current
    // chain) so a rollback of CURRENT never collides with orphaned snapshots
    val existing = Files.list(manifestsDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
        s.stripPrefix("snap-").stripSuffix(".json").toLong }
      .toSeq
    val snapId = (existing :+ -1L).max + 1
    // gather all pending (src, dst, rel) moves, then rename in parallel —
    // renames are per-file atomic and invisible until the manifest publishes,
    // but hundreds of serial metadata ops would become the job's Amdahl tail
    val moves = days.flatMap { day =>
      val src = Paths.get(stagingDir, s"warc_day=$day")
      if (!Files.exists(src)) Seq.empty
      else {
        val dst = dataDir.resolve(s"warc_day=$day")
        Files.createDirectories(dst)
        Files.list(src).iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .map { p =>
            val name = f"snap-$snapId%05d-${p.getFileName.toString}"
            (p, dst.resolve(name), s"data/warc_day=$day/$name")
          }.toSeq
      }
    }
    moves.asJava.parallelStream().forEach { t =>
      try Files.move(t._1, t._2, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // cross-filesystem staging (externally-created): fall back to
        // copy+rename — still invisible until the manifest publishes
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(t._1, t._2, StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    }
    val rel = Seq.newBuilder[String]
    moves.foreach { case (_, _, r) => rel += r }
    val m = Manifest(snapId, currentSnapshotId.getOrElse(-1L), days, rel.result(), lineage, statusCounts, version)
    val tmp = manifestsDir.resolve(s".snap-$snapId.tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m))
    Files.move(tmp, manifestsDir.resolve(f"snap-$snapId%05d.json"), StandardCopyOption.ATOMIC_MOVE)
    val ptrTmp = manifestsDir.resolve(".CURRENT.tmp")
    Files.writeString(ptrTmp, snapId.toString)
    Files.move(ptrTmp, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snapId
  }
}
