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

  /** Lowercased host of a URL ('' when the URL has no scheme/authority). */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#@]+@)?([^/:?#]+)", 2))

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
    val list = array(blocked.map(d => lit(d.toLowerCase)): _*)
    (size(array_intersect(hostSuffixes(host(url)), list)) > 0).cast("long")
  }

  /** Pages that survive the blocklist (the pre-extraction gate). */
  def allow(df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame =
    df.filter(isBlocked(col(urlCol), blocked) === 0)
}
