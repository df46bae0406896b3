package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-domain document cap — the domain-balancing step every large crawl
  * corpus runs so a handful of mega-hosts (forums, wikis, link farms) cannot
  * dominate the training mix (the C4/RefinedWeb-style "no domain exceeds its
  * budget" rule). Keeps a deterministic sample of at most `k` documents per
  * host; which k is keyed on a CONTENT-independent URL fingerprint, so the
  * choice is RNG-free and reproducible across engines and runs.
  *
  * 100 TB shape — the naive formulation is the textbook skew trap:
  * `row_number() OVER (PARTITION BY domain ORDER BY prio)` shuffles and sorts
  * EVERY row of the hottest domain into a single task (a 10^9-page host is a
  * multi-TB sort on one core). Instead the cap is decided by a per-domain
  * THRESHOLD computed with a bounded-heap partial aggregate
  * ([[extractous.spark.KthSmallestPair]]):
  *
  *  1. narrow-project `(host, prio, id)` — the page payload never moves;
  *  2. `groupBy(host).agg(kth_smallest_pair(prio, id, k))` — each map
  *     partition reduces to ≤ k 16-byte pairs per host before the exchange,
  *     so the hot host costs a merge of P bounded heaps, not a P-partition
  *     sort;
  *  3. hosts with fewer than k pages aggregate to null and are DROPPED from
  *     the threshold table — it holds one row per host AT the cap only (the
  *     heavy tail), which is metadata-sized and broadcast;
  *  4. pages left-join the broadcast threshold by host and keep rows with no
  *     threshold (host under cap) or `(prio, id) <=` the threshold pair —
  *     exactly k survivors per capped host, ties impossible because the pair
  *     ends in the unique row id.
  *
  * The corpus itself is never shuffled and never sorted; the only exchange
  * carries the k-bounded heap partials.
  */
object DomainBalance {

  /** At most `k` rows per URL host, deterministically keyed on
    * `poly_fingerprint(url)` with the row id as tie-break. Input columns are
    * preserved; a `host` column derived from `urlCol` is added, REPLACING any
    * pre-existing column of that name. Rows whose URL yields no parseable
    * host (host = "") are mutually unrelated documents, not one domain, so
    * they bypass the cap and are all kept (same posture as LinkGraph's
    * `host =!= ""` exclusion). `idCol` must be a BIGINT column — the
    * bounded-heap aggregate packs `(prio, id)` into 16-byte pairs.
    *
    * @param broadcastThresholds true (default) broadcasts the at-cap host
    *   table — right while hosts-at-cap ≤ ~10^7 (16-byte pairs + host
    *   strings). A crawl whose cap bites on more hosts than fits the
    *   broadcast budget passes false to shuffle-join by host instead; the
    *   exchange then carries `(host, prio, id)` page keys and the compact
    *   threshold rows, never page payloads.
    */
  def capPerDomain(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      k: Int,
      broadcastThresholds: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    require(df.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"idCol '$idCol' must be BIGINT (got ${df.schema(idCol).dataType.sql}); " +
        "cast or re-key before capping")
    val prio = TextStats.fingerprint(col(urlCol))
    val withKeys = df
      .withColumn("host", UrlFilter.host(col(urlCol)))
      .withColumn("_dc_prio", prio)
    val thresholds = withKeys
      .select(col("host"), col("_dc_prio"), col(idCol))
      .filter(col("host") =!= "") // host-less rows are not one domain: uncapped
      .groupBy("host")
      .agg(extractous.spark.topk.kth_smallest_pair(col("_dc_prio"), col(idCol), k).as("_dc_th"))
      .filter(col("_dc_th").isNotNull)
    val thSide = if (broadcastThresholds) broadcast(thresholds) else thresholds
    withKeys
      .join(thSide, Seq("host"), "left")
      .filter(col("_dc_th").isNull ||
        col("_dc_prio") < col("_dc_th.p") ||
        (col("_dc_prio") === col("_dc_th.p") && col(idCol) <= col("_dc_th.id")))
      .drop("_dc_prio", "_dc_th")
  }

  /** Hash-threshold modulus for [[temperatureResample]]: 2²⁰ keep-probability
    * quanta. The URL fingerprint lives in [0, 1e9+7), which is not a multiple
    * of 2²⁰, so residues carry a ≤ ~10⁻³ relative non-uniformity — irrelevant
    * for a sampler and identical in both engines.
    */
  val ResampleMod = 1L << 20

  /** Exact integer sqrt as a column: IEEE double sqrt is correctly rounded,
    * so `floor(sqrt(n))` is within ±1 of ⌊√n⌋ on every engine; the two
    * square-comparison fixups make the result exactly ⌊√n⌋ regardless of
    * which way the float rounded — bit-identical across engines by
    * construction, with no float ever crossing an engine boundary.
    */
  private[extractous] def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val up = when((s0 + 1) * (s0 + 1) <= n, s0 + 1).otherwise(s0)
    when(up * up > n, up - 1).otherwise(up)
  }

  /** Temperature-based domain REBALANCING (the α-sampling of mT5, Xue et
    * al. 2021 §3.1 / XLM-R, Conneau et al. 2020 §3.1, applied to hosts):
    * where [[capPerDomain]] hard-caps each host, this reshapes the whole
    * host distribution toward p(host) ∝ n_host^α with α = 1/2 — mega-hosts
    * are squashed ~√n while the long tail keeps most of its documents — and
    * scales it to ≈ `targetTotal` kept documents.
    *
    * Per host: weight w_h = ⌊√n_h⌋, keep probability
    * p_h = min(1, targetTotal·w_h / (Σw·n_h)), decided per page by the
    * RNG-free URL-fingerprint test
    *
    *   (fp(url) mod 2²⁰) · Σw · n_h  <  2²⁰ · targetTotal · w_h
    *
    * evaluated in DECIMAL(38,0) — multiplication only, no division, every
    * intermediate ≤ ~10²⁷ ≪ 10³⁸ — so the decision is exact integer
    * arithmetic an independent engine replays bit-identically (DuckDB:
    * HUGEINT). Duplicate URLs get the same verdict by construction.
    *
    * 100 TB shape: the only aggregation exchange carries per-host count
    * partials (map-side combined); the host-stats table (host, n, w) is
    * metadata-sized and broadcast back (`broadcastStats = false` shuffles
    * the join by host instead when the crawl has more hosts than fits the
    * broadcast budget); the keep decision is a narrow filter — the corpus
    * itself never shuffles, never sorts, and passes the executor boundary
    * exactly once. Host-less rows (unparseable URL) are mutually unrelated
    * documents, not one domain: they bypass the rebalance and are kept,
    * the same posture as [[capPerDomain]].
    */
  def temperatureResample(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      targetTotal: Long,
      broadcastStats: Boolean = true): DataFrame = {
    require(targetTotal > 0, "targetTotal must be positive")
    val dec = DecimalType(38, 0)
    val withKeys = df
      .withColumn("host", UrlFilter.host(col(urlCol)))
      .withColumn("_tr_fpm", pmod(TextStats.fingerprint(col(urlCol)), lit(ResampleMod)))
    // localCheckpoint: the host-stats table is metadata-sized but feeds BOTH
    // the Σw scalar and the join side — without it the per-host count
    // aggregation scans the corpus twice (eager, per-invocation; nothing
    // persists across runs)
    val stats = withKeys
      .filter(col("host") =!= "")
      .groupBy("host")
      .agg(count(lit(1)).as("_tr_n"))
      .withColumn("_tr_w", isqrt(col("_tr_n")))
      .localCheckpoint(true)
    // Σw is ONE scalar over the metadata-sized host table — a driver-side
    // reduce, not a corpus collect
    val sumW = Option(stats.agg(sum(col("_tr_w"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val statsSide = if (broadcastStats) broadcast(stats) else stats
    withKeys
      .join(statsSide, Seq("host"), "left")
      .filter(col("_tr_n").isNull ||
        (col("_tr_fpm").cast(dec) * lit(sumW).cast(dec) * col("_tr_n").cast(dec)) <
          (lit(ResampleMod).cast(dec) * lit(targetTotal).cast(dec) * col("_tr_w").cast(dec)))
      .drop("_tr_fpm", "_tr_n", "_tr_w")
  }
}
