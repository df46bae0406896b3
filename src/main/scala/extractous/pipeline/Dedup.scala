package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design: signatures (minhash/simhash) are computed as narrow per-row
  * expressions (higher-order functions over token arrays — all codegen'd, no
  * UDF); only the candidate-pair discovery shuffles, and it shuffles on short
  * band keys, never on document text. Exact verification joins signatures back
  * by id. At 10^12 docs the band-bucket join is the standard MinHash-LSH plan;
  * AQE's skew-join handles hot buckets.
  */
object Dedup {

  /** Exact dedup by full-column equality: one hash-aggregate shuffle on the
    * group key. Returns one representative (min id) per group + multiplicity.
    */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("cnt"))

  /** Exact dedup by md5 digest — the shuffle key shrinks from document text to
    * 32 bytes; at 100 TB that is the difference between shuffling the corpus
    * and shuffling 3% of it.
    */
  def byHash(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(keyCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("cnt"))

  /** Distinct word n-gram shingles of a single-space-tokenized text column. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = split(trim(textCol), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  private val Prime = 4294967311L // smallest prime > 2^32

  /** Deterministic (a, b) coefficient pairs for the minhash permutations. */
  private def coeffs(numHashes: Int): Seq[(Long, Long)] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until numHashes).map { j =>
      val a = (mix(j.toLong * 2 + 1) & 0x7fffffffL) | 1L // odd, < 2^31
      val b = mix(j.toLong * 2 + 2) & 0x7fffffffL
      (a, b)
    }
  }

  /** Base hashes for minhashing: one xxhash64 per shingle (materialize this
    * as its own column — every permutation reuses it; inlining it into
    * [[minhashSignature]] would recompute the string hashing `numHashes` times,
    * there is no common-subexpression elimination inside HOF lambdas).
    */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => pmod(xxhash64(s), lit(4294967296L)))

  /** MinHash signature (array<bigint> of length numHashes) over precomputed
    * shingle hashes: sig_j = min over shingles of (a_j * h + b_j) mod P. Pure
    * expression — computed where the row lives.
    */
  def minhashSignature(hashesCol: Column, numHashes: Int = 64): Column = {
    val perHash = coeffs(numHashes).map { case (a, b) =>
      array_min(transform(hashesCol, h => pmod(h * a + b, lit(Prime))))
    }
    array(perHash: _*)
  }

  /** Band keys for LSH: the signature split into `bands` bands of `rows` rows,
    * each hashed to one bucket key. Candidate pairs = pairs sharing any band
    * bucket.
    */
  def bandKeys(sigCol: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), i =>
      xxhash64(concat_ws("-",
        transform(slice(sigCol, i * rows + lit(1), lit(rows)), x => x.cast("string"))), i))

  /** Candidate pairs from band buckets: explode → self-join on (band, bucket).
    * Shuffle carries only (id, band_hash).
    */
  def lshCandidates(df: DataFrame, idCol: String, sigCol: String,
      bands: Int = 16, rows: Int = 4): DataFrame = {
    val b = df.select(col(idCol).as("id"),
      posexplode(bandKeys(col(sigCol), bands, rows)).as(Seq("band", "bucket")))
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over shingle arrays (verification step on candidates). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate →
    * exact-verify. Returns (id_a, id_b, jaccard) for verified pairs ≥ threshold.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 64, bands: Int = 16, rows: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("hs", shingleHashes(col("sh")))
      .withColumn("sig", minhashSignature(col("hs"), numHashes))
      .drop("hs")
    val cands = lshCandidates(withSig, "id", "sig", bands, rows)
    val sh = withSig.select(col("id"), col("sh"))
    cands
      .join(sh.as("sa"), col("id_a") === col("sa.id"))
      .join(sh.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"), jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over tokens: bit i of the fingerprint is the sign of the
    * sum over tokens of ±1 by bit i of xxhash64(token). Narrow expression —
    * the bit loop is unrolled at plan-build time (shift amounts must be
    * literals), the token loop is a single `aggregate` HOF.
    */
  def simhash(textCol: Column): Column = {
    // hash each token ONCE, then fold over the hash array (the 64 bit-probes
    // reference the lambda variable, not a recomputed xxhash64)
    val tokHashes = transform(tokens(textCol), t => xxhash64(t))
    val bitsOfHash = (h: Column) => array((0 until 64).map(i =>
      when(shiftright(h, i).bitwiseAND(1L) === 1L, 1).otherwise(-1)): _*)
    val bitVotes = aggregate(tokHashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitsOfHash(h), (a, v) => a + v))
    // fold votes to a long via a powers-of-two literal array (no dynamic shift)
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(zip_with(bitVotes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates via 16-bit chunk banding (pigeonhole: any
    * pair within Hamming distance 3 shares at least one of 4 chunks), then
    * exact Hamming verify ≤ maxDist.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xffffL)): _*)).as(Seq("chunk", "ckey")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
