package extractous.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
