package extractous.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link graph from page outlinks — crawl-frontier analytics
  * (which hosts does the corpus point at, and how hard).
  *
  * 100 TB shape: `extract_links` runs as a narrow per-row expression inside
  * the same projection as extraction; the explode emits bare URL strings and
  * the aggregate immediately reduces them to `(host, count)` with map-side
  * partial aggregation — the only exchange carries per-partition host
  * partials (bounded by the distinct-host count per partition), never page
  * HTML and never full URL lists.
  */
object LinkGraph {

  /** In-degree per target host over all pages' outlinks. */
  def hostInDegree(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(explode(extractous.spark.links.extract_links(col(htmlCol), col(urlCol))).as("link"))
      .select(UrlFilter.host(col("link")).as("host"))
      .filter(col("host") =!= "")
      .groupBy("host")
      .agg(count(lit(1)).as("in_degree"))

  /** Inbound anchor-text aggregation per TARGET host — the classic
    * web-corpus relevance/label signal (anchor text describes the page it
    * points AT; anchor-based weak labeling and query expansion both consume
    * exactly this table). Same 100 TB shape as the in-degree graph: narrow
    * [[extractous.spark.links.extract_anchors]] kernel, the explode emits
    * (host, short anchor string), map-side partial count, one short-key
    * exchange — page HTML never moves.
    */
  def anchorTexts(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(explode(extractous.spark.links.extract_anchors(col(htmlCol), col(urlCol))).as("a"))
      .select(UrlFilter.host(col("a.url")).as("host"), col("a.anchor").as("anchor"))
      .filter(col("host") =!= "")
      .groupBy("host", "anchor")
      .agg(count(lit(1)).as("cnt"))

  /** The distinct host→host edge set from page outlinks (self-loops kept —
    * a host linking itself is real crawl signal; the damping factor bounds
    * the rank it can self-concentrate).
    */
  def hostEdges(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(UrlFilter.host(col(urlCol)).as("src"),
        explode(extractous.spark.links.extract_links(col(htmlCol), col(urlCol))).as("link"))
      .select(col("src"), UrlFilter.host(col("link")).as("dst"))
      .filter(col("src") =!= "" && col("dst") =!= "")
      .distinct()

  /** Host-level PageRank (Page et al. 1999) — the standard crawl-quality
    * prior next to in-degree (Common Crawl publishes exactly this host
    * ranking). Entirely FIXED-POINT integer arithmetic so the result is
    * bit-identical across engines and parallelism levels: ranks live on a
    * `scale` grid, damping is the exact rational `dampNum/dampDen`, and every
    * division is a truncating BIGINT `div` that a SQL oracle replays 1:1.
    *
    * Per iteration: pr'(h) = base + (dampNum · Σ_{g→h} (pr(g) div outdeg(g)))
    * div dampDen, with base = (scale·(dampDen−dampNum)) div (dampDen·N).
    * Dangling hosts (no outlinks) simply drop their mass — the
    * no-redistribution variant, fine for a RELATIVE quality signal and the
    * published choice of several host-graph implementations; total mass only
    * ever shrinks, so Long sums cannot overflow (≤ scale ≪ 2⁶³).
    *
    * 100 TB shape: the page table is touched ONCE (narrow link kernel →
    * distinct short-string edges); every iteration exchanges only
    * `(host, long)` pairs — rank join + in-neighbor partial sums with
    * map-side combine — never HTML, never URLs. The edge set is persisted
    * across iterations (it is re-joined `iters` times); `iters` is small and
    * fixed (3 by default — host-rank uses few iterations because the signal
    * is consumed as terciles/quantiles, not absolute values), so lineage
    * stays shallow and no checkpointing is needed.
    */
  def hostPageRank(df: DataFrame, urlCol: String, htmlCol: String,
      iters: Int = 3, dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    require(dampNum > 0 && dampNum < dampDen, "damping must be a proper fraction")
    require(scale >= 1000000L, "scale too coarse for stable integer ranks")
    val spark = df.sparkSession
    val edges = hostEdges(df, urlCol, htmlCol)
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host")))
      .distinct()
      .persist()
    val n = nodes.count() // metadata-sized action: distinct hosts, not pages
    if (n == 0L) {
      nodes.unpersist()
      import spark.implicits._
      return Seq.empty[(String, Long)].toDF("host", "pr")
    }
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesD = edges.join(outdeg, "src").persist()
    val init = scale / n
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    var pr = nodes.select(col("host"), lit(init).as("pr"))
    var it = 0
    while (it < iters) {
      val contrib = edgesD
        .join(pr.withColumnRenamed("host", "src"), "src")
        .select(col("dst").as("host"), expr("pr div outdeg").as("c"))
        .groupBy("host")
        .agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, Seq("host"), "left")
        .select(col("host"),
          expr(s"CAST($base AS BIGINT) + ($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen")
            .as("pr"))
      it += 1
    }
    pr
  }
}
