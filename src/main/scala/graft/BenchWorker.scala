package graft

import extractous.gen.CorpusGen
import extractous.spark.{functions => xf}
import org.apache.spark.sql.SparkSession

/** One "executor" of the multi-JVM scaling measurement: a separate JVM
  * running `local[cores]` extraction over its slice of the corpus (a set of
  * day-partition directories). Prints one line the parent parses:
  * `[worker] docs=<n> secs=<s>` where secs is the in-worker timed extraction
  * (min of 2 reps) — JVM/session startup is excluded, as it would be on a
  * long-running cluster executor.
  */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dirs = args(1).split(',')
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
    val df = spark.read.parquet(dirs: _*).select("url", "html")
    val docs = df.count() // also warms this JVM's page-cache mappings + codegen
    def rep(): Double = {
      val t0 = System.nanoTime()
      xf.extractFrame(df, CorpusGen.flagshipConfig)
        .select("url", "text", "status")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val secs = (1 to reps).map(_ => rep()).min
    println(s"[worker] docs=$docs secs=$secs")
    spark.stop()
  }
}
