package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling for training-order reproducibility — the
  * "global shuffle" every epoch of LLM training needs, WITHOUT `rand()`
  * (non-reproducible across retries/partitionings — a poisoned lineage at
  * 10^12 rows) and WITHOUT materializing a permutation table (10^12 rows of
  * state to join against).
  *
  * A 4-round Feistel network over a fixed 2^62 domain maps `doc_id` to a
  * unique `skey` — a BIJECTION, so ordering by `skey` is a full
  * pseudorandom permutation of the corpus, reproducible from (seed, epoch)
  * alone. Round functions use only `* % >> & xor` on non-negative 63-bit-safe
  * intermediates, so the DuckDB oracle replays every round in BIGINT
  * arithmetic with zero float/overflow divergence.
  *
  * Scale shape: the key is a narrow codegen'd projection (zero exchange);
  * actually WRITING the shuffled order is `repartitionByRange(skey) +
  * sortWithinPartitions` — one range exchange, no global sort, no
  * SinglePartition window, and Feistel keys are uniform so the ranges
  * balance without sampling skew. Changing `seed` (e.g. per epoch) yields an
  * independent permutation.
  */
object Shuffle {

  /** Half-block width: domain = 2^(2K) = 2^62 covers any practical id
    * space; ids must be non-negative and < 2^62.
    */
  private val K = 31
  private val Mask = (1L << K) - 1

  private val C1 = 2654435761L // Knuth multiplicative (fits 63-bit products: r<2^31 ⇒ r*C1<2^62.4)
  private val C2 = 668265263L  // < 2^30, keeps the post-mod product < 2^62
  private val C3 = 40503L      // round-key stride

  /** The round function on Columns: F(r, i) = (((r·C1 + seed + i·C3) mod 2^32) · C2 >> 15) & mask. */
  private def roundF(r: Column, i: Int, seed: Long): Column =
    shiftright(
      pmod(r * lit(C1) + lit(seed + i.toLong * C3), lit(4294967296L)) * lit(C2),
      15).bitwiseAND(lit(Mask))

  /** Bijective shuffle key over [0, 2^62): 4 Feistel rounds on (hi, lo)
    * 31-bit halves of `id`.
    */
  def feistelKey(id: Column, seed: Long, rounds: Int = 4): Column = {
    var l = shiftright(id, K).bitwiseAND(lit(Mask))
    var r = id.bitwiseAND(lit(Mask))
    for (i <- 1 to rounds) {
      val f = roundF(r, i, seed)
      val nl = r
      val nr = l.bitwiseXOR(f)
      l = nl
      r = nr
    }
    (shiftleft(l, K) + r).as("skey")
  }

  /** Reference implementation for property tests (bit-twin of the Column
    * formulation).
    */
  def feistelKeyRef(id: Long, seed: Long, rounds: Int = 4): Long = {
    var l = (id >>> K) & Mask
    var r = id & Mask
    var i = 1
    while (i <= rounds) {
      val f = ((((r * C1 + seed + i.toLong * C3) % 4294967296L) * C2) >> 15) & Mask
      val nl = r
      val nr = l ^ f
      l = nl; r = nr
      i += 1
    }
    (l << K) + r
  }

  /** The corpus in shuffled order: ONE range exchange (no global sort, no
    * window), rows sorted by the bijective key within balanced ranges.
    */
  def shuffled(df: DataFrame, id: Column, seed: Long, partitions: Int): DataFrame = {
    val keyed = df.withColumn("skey", feistelKey(id, seed))
    keyed.repartitionByRange(partitions, col("skey")).sortWithinPartitions(col("skey"))
  }
}
