package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, arXiv
  * 1508.07909) — where [[Bpe]] applies a frozen merges table, this learns
  * one from the corpus itself, the way production tokenizer trainers
  * (SentencePiece BPE, GPT-2's) actually run at scale:
  *
  *   1. '''Word counting is the only corpus-scale stage.''' One scan,
  *      whitespace split, hash aggregate — map-side partial combine means
  *      the exchange carries each partition's DISTINCT words once, never
  *      the token stream. An optional `maxVocab` cap (top-V by count,
  *      word-lexicographic tie-break, via TakeOrderedAndProject — no global
  *      sort) bounds the collect for open-vocabulary crawls; at 10^12 docs
  *      this is the standard construction (HF tokenizers does exactly
  *      word-count → in-memory merges).
  *   2. '''The merge loop is model-sized driver state''' — O(V · w̄ · K)
  *      over the ≤V-row count table, the same ship-the-model posture as
  *      the IVF centroids and langid profiles: pair counts are WEIGHTED by
  *      word frequency, the argmax pair (ties: lexicographic) merges
  *      greedily left-to-right per word, K times.
  *
  * The trained table embeds in plan-shipped expressions for downstream
  * counting (the [[Bpe]] pattern), so application stays a narrow
  * zero-exchange projection.
  *
  * The `d_bpe_train` oracle replays the ENTIRE training loop in DuckDB —
  * word counts, per-iteration weighted pair counts, argmax with tie-break,
  * and the overlap-correct greedy merge application (as one recursive CTE
  * per iteration) — so a drift anywhere in the loop mismatches the merge
  * table bit-for-bit.
  */
object BpeTrain {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Corpus word counts — one scan, map-side combined, exchange bounded by
    * distinct words; capped at `maxVocab` rows by (count desc, word).
    * Splitting is `\s+` over trimmed text with empties dropped, matching
    * the pipeline's standard tokenizer (and the oracle's
    * `string_split_regex`).
    */
  def wordCounts(df: DataFrame, text: Column, maxVocab: Int): Array[(String, Long)] = {
    val counted = df
      .select(explode(split(trim(text), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab) // TakeOrderedAndProject: partial top-V per partition, no global sort
    counted.collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** The greedy merge loop over a (word, count) table — driver-side,
    * model-sized. Pair counts are weighted by word frequency; each
    * iteration merges the (count desc, left, right) argmax pair greedily
    * left-to-right (overlap semantics: "aaaa" under (a,a) → [aa, aa]).
    * Stops early when no pair remains (every word is one symbol).
    */
  def trainFromCounts(wc: Array[(String, Long)], numMerges: Int): Vector[Merge] = {
    var segs: Map[String, Vector[String]] =
      wc.iterator.map { case (w, _) => w -> w.map(_.toString).toVector }.toMap
    val out = Vector.newBuilder[Merge]
    var k = 1
    var done = false
    while (k <= numMerges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      wc.foreach { case (w, cnt) =>
        val s = segs(w)
        var i = 0
        while (i + 1 < s.length) {
          pc.updateWith((s(i), s(i + 1)))(v => Some(v.getOrElse(0L) + cnt))
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x, y) }
        out += Merge(k, a, b, c)
        segs = segs.map { case (w, s) => w -> BpeModel.mergeOnce(s, (a, b)) }
        k += 1
      }
    }
    out.result()
  }

  /** Full operator: corpus → trained merges table
    * (rank, left_sym, right_sym, pair_count).
    */
  def train(df: DataFrame, text: Column, numMerges: Int,
      maxVocab: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val merges = trainFromCounts(wordCounts(df, text, maxVocab), numMerges)
    merges.map(m => (m.rank.toLong, m.left, m.right, m.pairCount))
      .toDF("rank", "left_sym", "right_sym", "pair_count")
  }
}
