package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained quality CLASSIFIER — the fastText-style "train a model to
  * tell wiki-like from crawl-like" gate the LLaMA/CCNet pipelines run
  * (Touvron et al. 2023 §2; Wenzek et al. 2020 §4.4), distilled to its
  * distributed essence: a batch perceptron over integer text features.
  * Where [[LmQuality]] scores with a fixed LM and [[Dsir]] with fixed gram
  * profiles, this LEARNS its weights from labeled rows of the corpus
  * itself.
  *
  * Everything is exact 64-bit integer arithmetic — features are counts,
  * weights are integer sums, the margin test is `y·(w·x) ≤ 0` — so training
  * is bit-reproducible under any partitioning AND the DuckDB oracle replays
  * every iteration: the gradient is a sum over misclassified rows, the
  * update is vector addition, and the final per-doc scores/predictions
  * follow deterministically. No float ever crosses an engine boundary (the
  * repo-wide fixed-point discipline).
  *
  * Scale shape: the feature projection is narrow and cacheable; each of the
  * K iterations is ONE map-side-combined aggregation whose exchange carries
  * (dim+1)-component partial sums — model-sized, like the DSIR profile
  * build — and the updated weights ship back inside the next plan as
  * literals (the broadcast-model pattern). K passes over a cached feature
  * table is the textbook batch-GD cost model; converged-early detection
  * stops the loop when an iteration misclassifies nothing.
  */
object QualityTrain {

  /** Exact integer division for non-negative longs: (a − a mod b) ∕ b — the
    * numerator is exactly divisible and < 2^53, so the double division is
    * exact by IEEE-754 and the cast loses nothing. (Spark's `/` on longs is
    * DOUBLE division; raw floor(a/b) risks a one-ulp boundary error.)
    */
  private def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")

  /** Integer DENSITY features over a text column — each replayable 1:1 in
    * SQL with `//`. Densities, not raw counts: raw char/word counts put the
    * separating hyperplane at a tiny relative margin (the perceptron then
    * needs hundreds of epochs); per-256 densities separate junk from prose
    * at a wide margin, so training converges in one or two iterations —
    * the same normalize-your-features lesson every practical GD pipeline
    * learns, in exact integer form.
    */
  def features(text: Column): Seq[(String, Column)] = {
    val words = size(split(trim(text), "\\s+")).cast("long")
    val digits = (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long")
    val chars = length(text).cast("long")
    val the = ((length(text) - length(replace(text, lit("the"), lit("")))) / 3).cast("long")
    Seq(
      "x1" -> idiv(digits * lit(256L), chars), // digit density per 256 chars
      "x2" -> idiv(chars, words),              // mean word length (incl. separators)
      "x3" -> idiv(the * lit(256L), words))    // stopword density per 256 words
  }

  val Dim = 3

  /** w·x + bias as a Column, with the weights embedded as plan literals. */
  def scoreCol(w: Array[Long]): Column =
    (1 to Dim).foldLeft(lit(w(0)): Column)((acc, i) => acc + lit(w(i)) * col(s"x$i"))

  /** Batch-perceptron training over a feature frame with columns
    * (y ∈ {-1,1}, x1..x4). Each iteration aggregates Σ y·x over rows the
    * CURRENT weights misclassify (margin ≤ 0) and adds it to w; stops early
    * when nothing is misclassified. Deterministic: integer sums are
    * partitioning-invariant.
    */
  def train(feat: DataFrame, iters: Int): Array[Long] = {
    val w = Array.fill(Dim + 1)(0L)
    var k = 0
    var converged = false
    while (k < iters && !converged) {
      val miss = col("y") * scoreCol(w) <= 0
      val grads = sum(when(miss, col("y")).otherwise(lit(0L))).as("d0") +:
        (1 to Dim).map(i => sum(when(miss, col("y") * col(s"x$i")).otherwise(lit(0L))).as(s"d$i"))
      val row = feat.agg(grads.head, grads.tail: _*).head()
      var any = false
      var i = 0
      while (i <= Dim) {
        val d = if (row.isNullAt(i)) 0L else row.getLong(i)
        if (d != 0L) any = true
        w(i) += d
        i += 1
      }
      // a zero gradient can also mean misclassified contributions cancel;
      // converged means NO row was misclassified — check the margin count
      if (!any) {
        val nMiss = feat.filter(col("y") * scoreCol(w) <= 0).count()
        converged = nMiss == 0
      }
      k += 1
    }
    w
  }
}
