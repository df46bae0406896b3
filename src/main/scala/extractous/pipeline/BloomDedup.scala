package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-gated INCREMENTAL deduplication: drop documents of a new crawl
  * increment whose content fingerprint is (maybe) already in the seen
  * corpus, without shuffling either side.
  *
  * Why not the exact anti-join ([[Dedup.byHash]] shapes): incremental dedup
  * at 100 TB compares a small-ish increment against the FULL historical
  * corpus — an anti-join shuffles the increment AND re-reads + shuffles
  * 10¹²-key digests of history every day. The bloom path reads history's
  * fingerprints ONCE into an m-bit filter; each later increment is a narrow
  * zero-exchange projection against the broadcast bitset.
  *
  * Semantics (one-sided, the direction dedup wants): a kept document is
  * GUARANTEED new (Bloom filters have no false negatives); a false positive
  * drops a genuinely-new document with probability ≈ (1−e^(−k·n/m))^k —
  * bounded corpus loss, zero duplicate admission. Size m ≈ 1.44·k·n/ln2
  * bits for the target rate: ~1.2 GB of broadcast for 10⁹ seen keys at 1%.
  * Beyond broadcastable n, shard the seen side by `fp mod S` with one
  * filter per shard and probe each increment row against its own shard's
  * filter — the probe stays narrow because the shard id is a function of
  * the row's own fingerprint.
  *
  * Build shape: explode the K positions, ONE distinct aggregation whose
  * key space is bounded by m (≤ m rows through the exchange no matter how
  * large the seen side is), collect the positions, pack bits driver-side.
  *
  * Everything is exact integer arithmetic ([[extractous.spark.BloomKernel]]),
  * so the DuckDB oracle replays the filter bit-identically — false
  * positives included.
  */
object BloomDedup {

  /** 2¹⁷ bits = 16 KB: comfortable for the test corpus (n·k ≈ 2·10³ set
    * bits → FP rate ≈ (2·10³/1.3·10⁵)⁴ ≈ 6·10⁻⁸).
    */
  val DefaultBits = 131072

  /** A built filter carries its own m: probing with a different modulus
    * than the build silently breaks the no-false-negative guarantee, so
    * the pair is inseparable by construction.
    */
  final case class Filter(bits: Array[Long], m: Int) {
    require(m > 0 && bits.length == (m + 63) / 64, "bitset size must match m")
  }

  /** Packed m-bit filter of every `keyCol` fingerprint in `seen`. */
  def build(seen: DataFrame, keyCol: Column, m: Int = DefaultBits): Filter = {
    val pos = seen
      .select(explode(extractous.spark.bloom.bloom_positions(keyCol, m)).as("p"))
      .distinct()
      .collect()
    val bits = new Array[Long]((m + 63) / 64)
    pos.foreach { r =>
      val p = r.getLong(0)
      bits((p >>> 6).toInt) |= 1L << (p & 63)
    }
    Filter(bits, m)
  }

  /** `(idCol, maybe_seen)` for every probe row — a narrow zero-exchange
    * projection against the embedded filter; `maybe_seen` ∈ {0, 1}.
    */
  def flagged(probe: DataFrame, idCol: String, keyCol: Column, f: Filter): DataFrame =
    probe.select(col(idCol),
      extractous.spark.bloom.bloom_maybe_contains(keyCol, f.bits, f.m)
        .cast("long").as("maybe_seen"))

  /** The guaranteed-new subset of `probe` (drops maybe-seen rows). */
  def fresh(probe: DataFrame, keyCol: Column, f: Filter): DataFrame =
    probe.filter(!extractous.spark.bloom.bloom_maybe_contains(keyCol, f.bits, f.m))

  // ------------------------------------------------------------- sharding

  /** `shards` filters of `m` bits each, packed shard-major into one word
    * array. The past-10⁹-keys scale path: one 1%-FP filter for 10¹² seen
    * keys would be ~1.8 TB of bits — unbroadcastable — but 10⁴ shards of
    * ~180 MB each build independently (the aggregation is keyed by
    * (shard, position): still ONE exchange, ≤ shards·m rows through it, and
    * per-shard packing parallelizes trivially). A row's shard is
    * `floorMod(fp, shards)` — a pure function of its own fingerprint — so
    * the probe needs no join to find its filter and stays a narrow
    * zero-exchange projection.
    */
  final case class ShardedFilter(bits: Array[Long], m: Int, shards: Int) {
    require(m > 0 && shards > 0 && bits.length == shards * ((m + 63) / 64),
      "bitset size must be shards x words-per-shard")
  }

  /** Build `shards` packed m-bit filters of every `keyCol` in `seen`. */
  def buildSharded(seen: DataFrame, keyCol: Column, shards: Int,
      m: Int = DefaultBits): ShardedFilter = {
    require(shards > 0, "shards must be positive")
    val pos = seen
      .select(pmod(keyCol, lit(shards.toLong)).cast("int").as("shard"),
        explode(extractous.spark.bloom.bloom_positions(keyCol, m)).as("p"))
      .distinct()
      .collect()
    val wps = (m + 63) / 64
    val bits = new Array[Long](shards * wps)
    pos.foreach { r =>
      val p = r.getLong(1)
      bits(r.getInt(0) * wps + (p >>> 6).toInt) |= 1L << (p & 63)
    }
    ShardedFilter(bits, m, shards)
  }

  /** `(idCol, maybe_seen)` per probe row against the sharded filter —
    * same narrow zero-exchange shape as [[flagged]].
    */
  def flaggedSharded(probe: DataFrame, idCol: String, keyCol: Column,
      f: ShardedFilter): DataFrame =
    probe.select(col(idCol),
      extractous.spark.bloom.bloom_maybe_contains_sharded(keyCol, f.bits, f.m, f.shards)
        .cast("long").as("maybe_seen"))

  /** The guaranteed-new subset of `probe` under the sharded filter. */
  def freshSharded(probe: DataFrame, keyCol: Column, f: ShardedFilter): DataFrame =
    probe.filter(!extractous.spark.bloom.bloom_maybe_contains_sharded(keyCol, f.bits, f.m, f.shards))
}
