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
}
