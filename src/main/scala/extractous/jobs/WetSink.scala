package extractous.jobs

import extractous.core.Wet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET sidecar sink: corpus rows (url, date, text) → `part-NNNNN.warc.wet.gz`
  * files, one per input partition, each opening with a `warcinfo` record and
  * carrying one gzip member per conversion record — the Common Crawl sidecar
  * shape, so a WET consumer can read this engine's output with unmodified
  * crawl tooling (and [[extractous.core.WarcExtractor]] re-ingests it, which
  * WetSpec round-trips byte-for-byte).
  *
  * Plan shape at 100 TB: a pure per-partition streaming write — NO shuffle,
  * NO driver-side data, no buffering beyond one record (the gzip member is
  * built per record and appended; memory is O(record), not O(partition)).
  * Parallelism is the input's partitioning, which for a corpus read is file
  * granularity — the right unit, same argument as WarcIngest's.
  *
  * Lineage: each partition also writes a one-line JSON sidecar under
  * `_lineage/` (partition id, file, records, text bytes, extractor version)
  * — durable per-partition lineage + metrics in the file system next to the
  * data, the north-rule contract ExtractJob's snapshot lineage follows;
  * [[write]] returns them as a (partition-count-sized) DataFrame. Writes go
  * through `java.nio` against a local/shared path, the same executor-write
  * posture as the repo's staging dirs (a cluster deployment swaps in the
  * HadoopFS client here; framing and lineage are unchanged).
  */
object WetSink {

  /** Write `df` (columns url, date, text; date pre-formatted ISO-8601) as
    * WET files under `outDir`; returns the lineage frame read back from the
    * written sidecars (part_id, file, records, text_bytes, version), ordered
    * by part_id. `fileDate` stamps the warcinfo records — caller-supplied,
    * never the wall clock, so output is reproducible.
    */
  def write(df: DataFrame, outDir: String, fileDate: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir, "_lineage"))
    val version = extractous.model.ExtractResult.Version
    df.select(col("url").cast("string"), col("date").cast("string"), col("text").cast("string"))
      .as[(String, String, String)]
      .foreachPartition { (it: Iterator[(String, String, String)]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val name = f"part-$pid%05d.warc.wet.gz"
          val path = java.nio.file.Paths.get(outDir, name)
          val out = java.nio.file.Files.newOutputStream(path)
          var records = 0L
          var textBytes = 0L
          try {
            out.write(Wet.gzMember(Wet.warcinfo(name, fileDate)))
            it.foreach { case (url, date, text) =>
              out.write(Wet.gzMember(Wet.recordBytes(url, date, text)))
              records += 1
              textBytes += Wet.utf8Len(text)
            }
          } finally out.close()
          val lineage = s"""{"part_id": $pid, "file": "$name", "records": $records, """ +
            s""""text_bytes": $textBytes, "version": "$version"}"""
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, "_lineage", f"part-$pid%05d.json"),
            lineage.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ()
        }
      }
    spark.read.json(s"$outDir/_lineage")
      .select(col("part_id").cast("int"), col("file"), col("records").cast("long"),
        col("text_bytes").cast("long"), col("version"))
      .orderBy(col("part_id"))
  }
}
