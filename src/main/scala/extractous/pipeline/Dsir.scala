package extractous.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", NeurIPS 2023): pick the corpus
  * documents whose hashed-n-gram distribution looks most like a TARGET
  * distribution (a trusted high-quality subset), by scoring every document
  * with the log-likelihood ratio of its uni+bigram buckets under the
  * target vs source profiles.
  *
  * Deviations from the paper, both documented and deliberate:
  *  - weights are the repo's exact fixed-point base-2 log at ⅓-bit
  *    resolution ([[extractous.spark.DsirKernel.flog2cube]]) so the DuckDB
  *    oracle replays the ENTIRE operator (profiles, weights, scores,
  *    selection boundary) bit-identically — no float log crosses an engine
  *    boundary;
  *  - the per-document score is the MEAN per-gram ratio rather than the
  *    normalized sum, which removes the document-length bias the paper's
  *    Nt/Ns normalizer exists to correct, without needing that
  *    (float-valued) normalizer; selection is deterministic top-k
  *    (score desc, id asc) rather than Gumbel-noised resampling — RNG-free
  *    like every sampler in this repo ([[Sampling.split]]).
  *
  * 100 TB shape: three narrow scans and two metadata-sized exchanges.
  *  1. Profile build: one pass — explode hashed buckets, ONE aggregation
  *     with map-side partials keyed on ≤ B bucket ids (the conditional
  *     count folds target and source into the same exchange), collect
  *     2·B longs (128 KB at B=8192) to the driver.
  *  2. Scoring: a narrow projection with the λ table embedded in the
  *     expression (ships with the plan like the IVF centroids) — zero
  *     exchanges, the corpus never shuffles.
  *  3. Selection: the k-th (−score, id) threshold via the bounded-heap
  *     [[extractous.spark.KthSmallestPair]] (≤ k 16-byte pairs per
  *     partition through the exchange), broadcast back as ONE row — no
  *     `row_number()` window, no global sort of anything document-sized.
  */
object Dsir {

  val DefaultBuckets = 8192

  private def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TextStats.gramTokens(c)

  /** (source, target) bucket-count profiles from ONE scan: source counts
    * every document's grams, target counts the rows matching `targetPred`
    * (the trusted subset — target ⊆ source by construction, as in the
    * paper's "raw pool vs formal text" setup).
    */
  def profiles(df: DataFrame, textCol: String,
      targetPred: org.apache.spark.sql.Column,
      b: Int = DefaultBuckets): (Array[Long], Array[Long]) = {
    val rows = df
      .select(coalesce(targetPred.cast("long"), lit(0L)).as("is_t"),
        explode(extractous.spark.dsir.dsir_buckets(tokens(col(textCol)), b)).as("bkt"))
      .groupBy("bkt")
      .agg(count(lit(1)).as("s"), sum("is_t").as("t"))
      .collect()
    val src = new Array[Long](b)
    val tgt = new Array[Long](b)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      src(i) = r.getLong(1)
      tgt(i) = r.getLong(2)
    }
    (src, tgt)
  }

  /** Per-bucket weight table λ(b) = flog2cube(target(b)) − flog2cube(source(b)). */
  def lambdaTable(source: Array[Long], target: Array[Long]): Array[Long] = {
    require(source.length == target.length, "profile sizes differ")
    Array.tabulate(source.length)(i =>
      extractous.spark.DsirKernel.flog2cube(target(i)) -
        extractous.spark.DsirKernel.flog2cube(source(i)))
  }

  /** `(id, score)` for every document under an existing weight table —
    * a narrow zero-exchange projection.
    */
  def scored(df: DataFrame, idCol: String, textCol: String,
      lambda: Array[Long]): DataFrame =
    df.select(col(idCol),
      extractous.spark.dsir.dsir_score(tokens(col(textCol)), lambda).as("score"))

  /** End-to-end selection: build profiles from `df` itself (target =
    * rows matching `targetPred`), score everything, and flag the top `k`
    * documents. Returns `(idCol, score, selected)` with selected ∈ {0,1};
    * exactly k rows carry 1 whenever the corpus has ≥ k rows (ties broken
    * id-ascending, the repo-wide deterministic order).
    */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, k: Int,
      b: Int = DefaultBuckets): DataFrame = {
    require(k > 0, "k must be positive")
    val (src, tgt) = profiles(df, textCol, targetPred, b)
    // (id, score) pairs are 16 bytes/doc; materializing them once means the
    // gram tokenize+hash scoring scan runs ONCE instead of twice (the
    // threshold aggregate and the final projection both consume sc). Eager
    // + per-invocation: every run still computes from the parquet inputs.
    val sc = scored(df, idCol, textCol, lambdaTable(src, tgt)).localCheckpoint(true)
    val thr = sc.agg(extractous.spark.topk.kth_smallest_pair(
      negate(col("score")), col(idCol), k).as("_th"))
    sc.crossJoin(broadcast(thr))
      .select(col(idCol), col("score"),
        when(col("_th").isNull, lit(1L))
          .when(-col("score") < col("_th.p"), lit(1L))
          .when(-col("score") === col("_th.p") && col(idCol) <= col("_th.id"), lit(1L))
          .otherwise(lit(0L)).as("selected"))
  }
}
