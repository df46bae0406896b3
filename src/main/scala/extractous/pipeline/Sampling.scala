package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment stage of a
  * training-data pipeline.
  *
  * The split keys on the CONTENT fingerprint, not the row id: byte-identical
  * documents always land in the same split, so exact duplicates can never
  * leak from train into eval (id-keyed splits leak every unnoticed dup).
  * Assignment is a narrow per-row expression (the polynomial fingerprint is
  * a codegen'd HOF fold) — no shuffle, no RNG, reproducible across runs,
  * cluster sizes, and engines (the DuckDB oracle recomputes the same fold).
  */
object Sampling {

  def bucket(textCol: Column, buckets: Int = 100): Column =
    // null text (e.g. failed-extraction rows joined back in) folds to the
    // empty string's bucket: fingerprint(null) is null, and a null bucket
    // would fall through every `when` and silently route all such rows to
    // the LAST split instead of a deterministic assignment
    pmod(TextStats.fingerprint(coalesce(textCol, lit(""))), lit(buckets.toLong))

  /** Adds `bucket` (0..99) and `split` (train/val/test at trainPct/valPct). */
  def split(df: DataFrame, textCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = bucket(col(textCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < trainPct, lit("train"))
          .when(b < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }
}
