package graft

import extractous.gen.CorpusGen
import extractous.spark.{functions => xf}
import org.apache.spark.sql.SparkSession

/** One "executor" of the multi-JVM scaling measurement: a separate JVM
  * running `local[cores]` extraction over one or more corpus slices (sets of
  * day-partition directories, ';'-separated). With one slice it times that
  * slice (min of `reps`); with several it processes them back-to-back and
  * reports the SUM — the sequential baseline of the scaling pair, in one JVM
  * so its boot cost is amortized exactly like a long-running executor's.
  * Prints `[worker] ready` once boot + warmup are done, blocks on stdin for
  * the parent's release (start barrier — concurrent siblings must all be
  * warm before any timed region opens), then prints the line the parent
  * parses: `[worker] docs=<n> secs=<s>`. JVM/session startup and an untimed
  * JIT-warmup rep are excluded from the timing.
  */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val slices = args(1).split(';').map(_.split(','))
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"bench-worker-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rep(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      xf.extractFrame(df, CorpusGen.flagshipConfig)
        .select("url", "text", "status")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    var totalDocs = 0L
    var totalSecs = 0.0
    val dfs = slices.zipWithIndex.map { case (dirs, i) =>
      val df = spark.read.parquet(dirs.toIndexedSeq: _*).select("url", "html")
      totalDocs += df.count() // warms page-cache mappings + codegen, untimed
      if (i == 0) rep(df.limit(2000)) // JIT warmup, untimed
      df
    }
    // start barrier: boot, heap pre-touch, and warmup are done — tell the
    // parent and wait for the release so no sibling worker's startup storm
    // lands inside this worker's timed region (see Bench.awaitReady)
    println("[worker] ready")
    scala.io.StdIn.readLine() // parent writes one newline (or closes stdin)
    dfs.foreach { df => totalSecs += (1 to reps).map(_ => rep(df)).min }
    println(s"[worker] docs=$totalDocs secs=$totalSecs")
    spark.stop()
  }
}
