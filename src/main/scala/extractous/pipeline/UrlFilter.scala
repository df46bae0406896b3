package extractous.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain blocklist filtering — the UT1/RefinedWeb-style URL gate every crawl
  * pipeline runs before spending extraction compute on a page.
  *
  * Matching is suffix-correct (a blocked `example.com` blocks
  * `sub.example.com` but NOT `notexample.com`): the host's dot-suffixes are
  * materialized with codegen'd HOFs and intersected with the blocklist.
  *
  * 100 TB shape: a blocklist is metadata-sized (UT1 is a few MB), so it ships
  * as a LITERAL array inside the expression — the filter is a narrow per-row
  * projection with zero joins, zero shuffles, zero broadcast exchanges, and
  * it composes into the same whole-stage-codegen projection as the MIME
  * sniff. (An exploded suffix equi-join against a blocklist DataFrame would
  * re-shuffle per page for no reason; reserve that shape for blocklists too
  * large to inline, which UT1-class lists are not.)
  */
object UrlFilter {

  /** Lowercased host of a URL ('' when the URL has no scheme/authority).
    * The userinfo class permits ':' — `user:pass@evil.com` must yield
    * `evil.com`, not `user` (a gate-bypassing mis-parse the old
    * `[^/:?#@]+@` class allowed, since it could not match across the
    * password colon).
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** All dot-suffixes of a host: `a.b.example.com` →
    * [a.b.example.com, b.example.com, example.com, com].
    */
  def hostSuffixes(h: Column): Column = {
    val parts = split(h, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => concat_ws(".", slice(parts, i, size(parts))))
  }

  /** 1 when the URL's host or any of its parent domains is in `blocked`. */
  def isBlocked(url: Column, blocked: Seq[String]): Column = {
    val list = array(blocked.map(d => lit(extractous.text.Normalize.lowerAscii(d))): _*)
    (size(array_intersect(hostSuffixes(host(url)), list)) > 0).cast("long")
  }

  /** Pages that survive the blocklist (the pre-extraction gate). */
  def allow(df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame =
    df.filter(isBlocked(col(urlCol), blocked) === 0)

  /** URL path (+ "/" default), for robots matching. */
  def path(url: Column): Column = {
    val p = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/[^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Robots-exclusion gate (RFC 9309) — the other half of crawl URL
    * hygiene: `robots` is a `(host, robots_txt)` table; each page is matched
    * against its host's rules for `agent`.
    *
    * Shape: the per-host robots text is parsed ONCE per robots row by the
    * imperative `robots_rules` expression (group selection per RFC 9309 §2.2:
    * the most specific matching user-agent group wins, `*` is the fallback,
    * consecutive agent lines share a group), then pages join robots by host
    * (broadcast or host-shuffle — see `broadcastRobots`) and the
    * longest-match/allow-wins decision runs as codegen'd HOFs over the rule
    * array. Prefix rules only (the
    * overwhelming majority in the wild); `*`/`$` wildcard rules are
    * IGNORED rather than mis-applied, and a host with no robots row allows
    * everything — both per the RFC's fail-open posture.
    *
    * Output: input columns + `blocked` (0/1).
    */
  /** @param broadcastRobots true (default) broadcasts the parsed rule table —
    *   right when robots covers a UT1-scale host list (≤ ~10^6 hosts). A full
    *   web crawl has ~10^8 hosts whose parsed rules exceed broadcast budgets:
    *   pass false to shuffle-join on host instead — the exchange carries the
    *   compact rule arrays and the pages' join columns, never page payloads,
    *   and AQE handles host skew like the dedup band joins.
    */
  def robotsBlocked(pages: DataFrame, urlCol: String, robots: DataFrame, agent: String,
      broadcastRobots: Boolean = true): DataFrame = {
    // one row per host BEFORE the join — duplicate robots rows (refetches)
    // would otherwise duplicate every page of that host through the equi-join;
    // max() picks deterministically
    val rules = robots
      .groupBy(lower(col("host")).as("_rhost"))
      .agg(max(col("robots_txt")).as("_txt"))
      .select(col("_rhost"),
        extractous.spark.RobotsRulesExpr.rules(col("_txt"), agent).as("_rules"))
    val p = path(col(urlCol))
    val rulesSide = if (broadcastRobots) broadcast(rules) else rules
    val joined = pages
      .withColumn("_phost", host(col(urlCol)))
      .join(rulesSide, col("_phost") === col("_rhost"), "left")
    val applicable = filter(coalesce(col("_rules"),
      array().cast("array<struct<allow:boolean,prefix:string>>")),
      r => p.startsWith(r.getField("prefix")))
    // longest prefix wins; Allow wins a length tie (RFC 9309 §2.4.2)
    val best = aggregate(applicable,
      struct(lit(false).as("allow"), lit("").as("prefix")),
      (acc, r) => {
        val rLen = length(r.getField("prefix"))
        val aLen = length(acc.getField("prefix"))
        when(rLen > aLen || (rLen === aLen && r.getField("allow")), r).otherwise(acc)
      })
    joined
      .withColumn("blocked",
        (length(best.getField("prefix")) > 0 && !best.getField("allow")).cast("long"))
      .drop("_phost", "_rhost", "_rules")
  }
}
