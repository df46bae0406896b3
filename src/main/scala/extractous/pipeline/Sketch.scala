package extractous.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cardinality sketching for corpus accounting — "how many distinct
  * documents" at 10^12 rows without a full count-distinct.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest
  * distinct hash values; if the k-th smallest is h_k over a hash space of
  * size M, the distinct count ≈ (k−1)·M/h_k. The plan is
  * scale-shaped: the content fingerprint is a narrow per-row kernel, the
  * distinct collapses 8-byte keys with map-side combine, and the k smallest
  * merge via TakeOrdered (per-partition top-k, driver merge of k values) —
  * no global sort, no wide shuffle of anything document-sized.
  *
  * The hash is the repo's SQL-twin polynomial fingerprint (mod 1e9+7), so
  * the DuckDB oracle replays the ENTIRE sketch — same hashes, same k-th
  * value, same integer estimate — rather than rows-only checking. The
  * ~2^30 hash space is plenty for the estimator (uniformity is what
  * matters); collisions hit both engines identically by construction.
  */
object Sketch {
  final val FingerprintSpace = 1000000007.0

  /** One row: (k_used, kth_hash, distinct_est). Exact when fewer than k
    * distinct hashes exist; the KMV estimate otherwise. All outputs are
    * longs — the estimate divides exactly-representable doubles, floored,
    * so it is bit-identical across engines and parallelism levels.
    */
  def kmvDistinct(df: DataFrame, textCol: String, k: Int = 64): DataFrame = {
    // null text hashes as the empty document (fingerprint 0) — otherwise a
    // null fingerprint sorts FIRST under the ascending limit and would
    // occupy one of the k minimum slots, biasing the estimate upward
    val smallest = df.select(TextStats.fingerprint(coalesce(col(textCol), lit(""))).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
    smallest
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(col("k_used"),
        coalesce(col("kth_hash"), lit(0L)).as("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(FingerprintSpace) /
            greatest(col("kth_hash"), lit(1L))).cast("long"))
          .as("distinct_est"))
  }
}
