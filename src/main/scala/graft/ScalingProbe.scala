package graft

import extractous.gen.CorpusGen
import extractous.jobs.ExtractJob
import extractous.spark.{functions => xf}
import org.apache.spark.sql.SparkSession

/** One-off phase-isolation probe for the scaling bench (not part of the
  * driver contract): times pure extraction (noop sink) vs the full job at two
  * parallelism levels, two repeats each.
  */
object ScalingProbe {
  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN"); s
  }
  private def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    Seq(8, 32, 8, 32).foreach { cores =>
      val s = session(cores)
      val extractT = (1 to 2).map { _ =>
        time(xf.extractFrame(s.read.parquet(corpusDir), CorpusGen.flagshipConfig)
          .select("url", "text", "status").write.mode("overwrite").format("noop").save())
      }
      val jobT = (1 to 2).map { _ =>
        val t = java.nio.file.Files.createTempDirectory(s"probe$cores").toString
        time(ExtractJob.run(s, corpusDir, t, groupSize = 30))
      }
      println(f"[probe] cores=$cores extract=${extractT.map(x => f"$x%.2f").mkString(",")} job=${jobT.map(x => f"$x%.2f").mkString(",")}")
      s.stop()
    }
  }
}
