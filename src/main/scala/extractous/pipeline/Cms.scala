package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide phrase-frequency estimation via a Count–Min sketch
  * (Cormode & Muthukrishnan 2005) — "how often does each candidate phrase
  * occur across the crawl?" without the 10¹⁴-gram-row shuffle the textbook
  * explode + groupBy(gram) would need at 100 TB.
  *
  * Two-phase shape:
  *
  *  1. BUILD — one scan of the corpus: a narrow kernel explodes each
  *     document's 4·(n−1) flat slot ids ([[extractous.spark.CmsKernel]]),
  *     and ONE count aggregation collapses them. The aggregation key space
  *     is bounded by 4·W, so map-side combine reduces every partition to
  *     ≤ 4·W rows before the exchange — the shuffle cost is a function of
  *     the sketch size, not the corpus size. The ≤ 4·W (slot, count) rows
  *     collect to a driver-side counter array (32 KB at W = 1024; a
  *     100 TB-corpus deployment sizes W ≈ 2²² for ±2·N/W ≈ ±5·10⁷ error,
  *     still a 134 MB metadata object).
  *  2. PROBE — candidates (a watchlist, or phrases discovered from a small
  *     deterministic sample) score in a narrow zero-exchange projection
  *     against the embedded counter array. The guarantee is one-sided:
  *     estimate ≥ true count always (min over D = 4 hashed rows), so a
  *     "rare" verdict is trustworthy and a "hot" verdict overcounts by
  *     ≤ 2·N/W with probability 1 − 2⁻⁴.
  *
  * All hashing is the repo's SQL-twin integer arithmetic, so the DuckDB
  * oracle replays the sketch itself — counter collisions included.
  */
object Cms {

  /** 4 × 1024 counters = 32 KB: at the test corpus' ~25k bigram occurrences
    * over a closed 31-word vocabulary the per-row load factor is ~24 grams
    * per counter, giving visible-but-bounded collisions the oracle must
    * reproduce exactly.
    */
  val DefaultWidth = 1024

  /** A built sketch carries its own width: probing with a different W than
    * the build would silently break the overcount guarantee, so the pair is
    * inseparable by construction (same posture as [[BloomDedup.Filter]]).
    */
  final case class Sketch(counters: Array[Long], w: Int) {
    require(w > 0 && counters.length == extractous.spark.CmsKernel.D * w,
      "counter array size must match D*w")
  }

  /** Whitespace-token adjacent-bigram gram hash of two word columns — the
    * probe-side twin of the build kernel's gram space.
    */
  def gramHash(w1: Column, w2: Column): Column =
    (TextStats.fingerprint(w1) * lit(extractous.spark.DsirKernel.BigramMix) +
      TextStats.fingerprint(w2)) % lit(extractous.spark.CmsKernel.Mod)

  /** Count–Min sketch of every adjacent token bigram in `textCol`. */
  def build(df: DataFrame, textCol: String, w: Int = DefaultWidth): Sketch = {
    val rows = df
      .select(explode(extractous.spark.cms.cms_slots(
        TextStats.gramTokens(col(textCol)), w)).as("slot"))
      .groupBy("slot").count()
      .collect()
    val counters = new Array[Long](extractous.spark.CmsKernel.D * w)
    rows.foreach { r => counters(r.getLong(0).toInt) = r.getLong(1) }
    Sketch(counters, w)
  }

  /** `(w1, w2, est)` for every candidate bigram row — a narrow
    * zero-exchange projection against the embedded sketch.
    */
  def estimatePhrases(candidates: DataFrame, w1Col: String, w2Col: String,
      sketch: Sketch): DataFrame =
    candidates.select(col(w1Col), col(w2Col),
      extractous.spark.cms.cms_estimate(
        gramHash(col(w1Col), col(w2Col)), sketch.counters, sketch.w).as("est"))

  /** Distinct adjacent token bigrams of `textCol` — the candidate-discovery
    * helper for a SMALL deterministic sample (the caller filters the frame
    * first; discovering from the full corpus would be the exact gram
    * shuffle the sketch exists to avoid).
    */
  def candidateBigrams(sample: DataFrame, textCol: String): DataFrame = {
    val ts = TextStats.gramTokens(col(textCol))
    // sequence(1, n−1) DESCENDS when n < 2 (Spark generates [1, 0]), so the
    // short-document case must be guarded to an empty array explicitly
    val pairs = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i =>
        struct(element_at(ts, i).as("w1"), element_at(ts, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    sample
      .select(explode(pairs).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .distinct()
  }
}
