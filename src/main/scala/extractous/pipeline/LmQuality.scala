package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality bucketing (Wenzek et al., LREC 2020,
  * §4.4): train a small LM on a TRUSTED reference subset of the corpus,
  * score every document by its mean per-token surprise under that model,
  * and split the corpus into head / middle / tail perplexity terciles
  * (CCNet trains on head+middle and drops the tail).
  *
  * This is the order-2 upgrade of [[TextStats.rarityReport]] (the order-0
  * corpus-frequency analog): the model conditions on the previous token, so
  * shuffled-word salad that passes a frequency filter scores as high
  * surprise here. It complements — does not replace — [[Dsir]]: DSIR ranks
  * by a target-vs-source likelihood RATIO (distribution matching), the LM
  * filter by absolute likelihood under the trusted model (fluency).
  *
  * 100 TB shape — three narrow scans, only metadata through the driver:
  *  1. Model: one pass — explode hashed gram buckets prefixed with a −1
  *    sentinel per row (so the same aggregation also yields the corpus row
  *    count for the tercile k's), ONE count aggregation keyed on ≤ 2·B+1
  *    bucket ids, collect 2·B longs (128 KB at B=8192).
  *  2. Thresholds: the fixed-point score is PROVABLY bounded — each
  *    per-position term lies in [−51, 51] (flog2cube of a saturated count
  *    is 51), so the per-document mean ×64 lies in [−3264, 3264], at most
  *    6529 distinct values. Exact tercile boundaries therefore come from a
  *    score HISTOGRAM (one aggregation keyed on ≤ 6529 longs) — no
  *    `ntile()` window, no global sort, and unlike a bounded-heap k-th
  *    selection the cost does NOT grow with ⌊N/3⌋ (which at 10^12 rows no
  *    heap could hold).
  *  3. Labeling: the same narrow scoring projection against two literal
  *    thresholds — zero joins, zero exchanges.
  *
  * Tercile semantics are CCNet's percentile thresholds, not an exact
  * three-way split: ties on the boundary score stay together (head =
  * score ≤ s1 where s1 is the smallest score whose cumulative count
  * reaches ⌊N/3⌋), so bucket sizes can deviate from N/3 exactly where
  * score ties make any deterministic equal split arbitrary.
  *
  * All arithmetic is the exact fixed-point integer scheme of
  * [[extractous.spark.LmKernel]], so the DuckDB oracle replays model,
  * scores, and boundaries bit-identically.
  */
object LmQuality {

  val DefaultBuckets = 8192

  /** Tokenization shared with [[Dsir]] via [[TextStats.gramTokens]] (plain
    * `\s+` split, null ≡ empty; the oracle mirrors `string_split_regex`).
    */
  private def tokens(c: Column): Column = TextStats.gramTokens(c)

  /** `(counts, corpusRows)`: the 2·B-entry gram count table from the rows
    * matching `trustedPred`, plus the FULL corpus row count (for the
    * tercile boundaries) — one scan, one metadata-sized aggregation.
    */
  def model(df: DataFrame, textCol: String, trustedPred: Column,
      b: Int = DefaultBuckets): (Array[Long], Long) = {
    val rows = df
      .select(coalesce(trustedPred.cast("long"), lit(0L)).as("is_t"),
        explode(concat(array(lit(-1L)),
          extractous.spark.lm.lm_buckets(tokens(col(textCol)), b))).as("bkt"))
      .groupBy("bkt")
      .agg(count(lit(1)).as("n"), sum("is_t").as("t"))
      .collect()
    val counts = new Array[Long](2 * b)
    var total = 0L
    rows.foreach { r =>
      val bkt = r.getLong(0)
      if (bkt < 0) total = r.getLong(1)
      else counts(bkt.toInt) = r.getLong(2)
    }
    (counts, total)
  }

  /** `(id, surprise_x64)` for every document under an existing model — a
    * narrow zero-exchange projection.
    */
  def scored(df: DataFrame, idCol: String, textCol: String,
      counts: Array[Long]): DataFrame =
    df.select(col(idCol),
      extractous.spark.lm.lm_surprise(tokens(col(textCol)), counts).as("surprise_x64"))

  /** Exact tercile boundary scores from a score histogram: `(s1, s2)` where
    * `s1` is the smallest score whose cumulative count reaches ⌊N/3⌋ (None
    * when ⌊N/3⌋ = 0) and `s2` likewise for ⌊2N/3⌋.
    */
  private[extractous] def thresholds(sc: DataFrame, total: Long): (Option[Long], Option[Long]) = {
    val k1 = total / 3
    val k2 = 2 * total / 3
    if (k2 == 0L) return (None, None)
    val hist = sc.groupBy(col("surprise_x64")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    var s1: Option[Long] = None
    var s2: Option[Long] = None
    hist.foreach { case (s, n) =>
      cum += n
      if (s1.isEmpty && k1 > 0 && cum >= k1) s1 = Some(s)
      if (s2.isEmpty && cum >= k2) s2 = Some(s)
    }
    (s1, s2)
  }

  /** End-to-end CCNet bucketing: train on `trustedPred` rows, score
    * everything, label head / middle / tail by the corpus-wide surprise
    * tercile thresholds (ties on a boundary score share its bucket).
    * Returns `(idCol, surprise_x64, bucket)`.
    */
  def bucketed(df: DataFrame, idCol: String, textCol: String,
      trustedPred: Column, b: Int = DefaultBuckets): DataFrame = {
    val (counts, total) = model(df, textCol, trustedPred, b)
    val sc = scored(df, idCol, textCol, counts)
    val (s1, s2) = thresholds(sc, total)
    val bucket = (s1, s2) match {
      case (Some(a), Some(c)) =>
        when(col("surprise_x64") <= a, lit("head"))
          .when(col("surprise_x64") <= c, lit("middle"))
          .otherwise(lit("tail"))
      case (None, Some(c)) =>
        when(col("surprise_x64") <= c, lit("middle")).otherwise(lit("tail"))
      case _ => lit("tail") // N < 2: no boundary reaches a tercile
    }
    sc.select(col(idCol), col("surprise_x64"), bucket.as("bucket"))
  }
}
