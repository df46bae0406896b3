package extractous.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verification-edge join (SURVEY.md §2.2 "Joins"): compare a produced
  * extraction table against a golden table on `url` with a full outer join —
  * the only join in the system; the extraction hot path itself has none.
  * AQE picks broadcast vs sort-merge by golden-side size.
  */
object DiffJob {

  final case class DiffSummary(matched: Long, mismatched: Long, missing: Long, unexpected: Long)

  /** Row-level diff: status ∈ {match, mismatch, missing (golden only),
    * unexpected (produced only)} per url.
    */
  def diff(produced: DataFrame, golden: DataFrame): DataFrame = {
    val p = produced.select(col("url"), col("text").as("p_text"))
    val g = golden.select(col("url"), col("text").as("g_text"))
    p.join(g, Seq("url"), "full_outer")
      .withColumn("diff", when(col("p_text").isNull, lit("missing"))
        .when(col("g_text").isNull, lit("unexpected"))
        .when(col("p_text") === col("g_text"), lit("match"))
        .otherwise(lit("mismatch")))
  }

  def summarize(spark: SparkSession, produced: DataFrame, golden: DataFrame): DiffSummary = {
    val counts = diff(produced, golden).groupBy("diff").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    DiffSummary(
      matched = counts.getOrElse("match", 0L),
      mismatched = counts.getOrElse("mismatch", 0L),
      missing = counts.getOrElse("missing", 0L),
      unexpected = counts.getOrElse("unexpected", 0L))
  }
}
