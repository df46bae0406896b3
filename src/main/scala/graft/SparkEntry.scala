package graft

import extractous.config._
import extractous.gen.CorpusGen
import extractous.spark.{functions => xf}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — queries (Spark) + oracleSql (DuckDB twin on the same
  * parquet tables). The extraction queries run the REAL pipeline end-to-end:
  * deterministic payload synthesis from documents.parquet → MIME sniff →
  * format parser → canonical text; the oracle reconstructs the expected output
  * in closed form from (doc_id, text, lang). See extractous.gen.CorpusGen.
  */
object SparkEntry {

  // ---- shared SQL fragments (DuckDB dialect, ASCII-safe) ----
  private val sqlUrl =
    "'https://host-' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 + doc_id % 9 END AS VARCHAR) || '.example/doc-' || CAST(doc_id AS VARCHAR)"
  private val sqlStop =
    "CASE lang WHEN 'de' THEN 'der die und nicht das' WHEN 'es' THEN 'el la los y no' WHEN 'fr' THEN 'le la les et ne' WHEN 'zh' THEN '的 了 是 在 不' ELSE 'the and of to in' END"
  private val sqlKind = "doc_id % 100"
  private val sqlId = "CAST(doc_id AS VARCHAR)"

  private def corpusDf(s: SparkSession, dir: String): DataFrame =
    CorpusGen.corpus(s, dir).toDF()

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("x_extract")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- extraction family (full pipeline, oracle-checked) ----------
    "x_extract" -> ((s, dir) => {
      val out = xf.extractFrame(corpusDf(s, dir), CorpusGen.flagshipConfig)
      out.select(col("url"), col("text"), col("status").cast("long").as("status"), col("content_type"))
        .orderBy(col("url"))
    }),
    "x_sniff" -> ((s, dir) => {
      corpusDf(s, dir)
        .select(col("url"), xf.sniff_mime(col("html")).as("mime"))
        .orderBy(col("url"))
    }),
    "x_metadata" -> ((s, dir) => {
      val out = xf.extractFrame(corpusDf(s, dir), CorpusGen.flagshipConfig)
      out.filter(col("content_type").isin("text/html", "application/pdf",
          "application/vnd.openxmlformats-officedocument.wordprocessingml.document") && col("status") === 0)
        .filter(!col("text").startsWith("SCAN ")) // scanned PDFs carry no Info dict
        .select(col("url"),
          coalesce(element_at(element_at(col("metadata"), lit("dc:title")), 1), lit("")).as("title"))
        .orderBy(col("url"))
    }),
    "x_truncate" -> ((s, dir) => {
      val cfg = CorpusGen.flagshipConfig.copy(maxStringLength = 100)
      xf.extractFrame(corpusDf(s, dir), cfg)
        .filter(col("content_type") === "text/plain" && col("status") === 0)
        .select(col("url"), col("text"), length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("url"))
    }))

  def oracleSql: Map[String, String] = Map(
    "x_extract" ->
      s"""SELECT $sqlUrl AS url,
         |CASE
         |  WHEN $sqlKind < 55 THEN 'Document ' || $sqlId || chr(10) || $sqlStop || chr(10) || text
         |  WHEN $sqlKind < 70 THEN text
         |  WHEN $sqlKind < 82 THEN 'Document ' || $sqlId || chr(10) || text || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Note ' || $sqlId ELSE '' END
         |  WHEN $sqlKind < 90 THEN 'Document ' || $sqlId || chr(10) || text || chr(10) || 'SHAPE ' || $sqlId
         |  WHEN $sqlKind < 96 THEN 'DOC ' || $sqlId || chr(10) || rtrim(substr(text, 1, 40))
         |  WHEN $sqlKind < 98 THEN 'SCAN ' || $sqlId || chr(10) || rtrim(substr(text, 1, 20))
         |  ELSE ''
         |END AS text,
         |CAST(CASE WHEN $sqlKind = 99 THEN (CASE WHEN doc_id % 3 = 2 THEN -2 ELSE -4 END) ELSE 0 END AS BIGINT) AS status,
         |CASE
         |  WHEN $sqlKind < 55 THEN 'text/html'
         |  WHEN $sqlKind < 70 THEN 'text/plain'
         |  WHEN $sqlKind < 82 THEN 'application/pdf'
         |  WHEN $sqlKind < 90 THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
         |  WHEN $sqlKind < 96 THEN (CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'image/png' END)
         |  WHEN $sqlKind < 98 THEN 'application/pdf'
         |  WHEN $sqlKind = 98 THEN 'application/octet-stream'
         |  ELSE (CASE WHEN doc_id % 3 = 0 THEN 'application/pdf' WHEN doc_id % 3 = 1 THEN 'application/zip' ELSE 'text/plain' END)
         |END AS content_type
         |FROM documents ORDER BY url""".stripMargin,
    "x_sniff" ->
      s"""SELECT $sqlUrl AS url,
         |CASE
         |  WHEN $sqlKind < 55 THEN 'text/html'
         |  WHEN $sqlKind < 70 THEN 'text/plain'
         |  WHEN $sqlKind < 82 THEN 'application/pdf'
         |  WHEN $sqlKind < 90 THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
         |  WHEN $sqlKind < 96 THEN (CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'image/png' END)
         |  WHEN $sqlKind < 98 THEN 'application/pdf'
         |  WHEN $sqlKind = 98 THEN 'application/octet-stream'
         |  ELSE (CASE WHEN doc_id % 3 = 0 THEN 'application/pdf' WHEN doc_id % 3 = 1 THEN 'application/zip' ELSE 'application/octet-stream' END)
         |END AS mime
         |FROM documents ORDER BY url""".stripMargin,
    "x_metadata" ->
      s"""SELECT $sqlUrl AS url, 'Document ' || $sqlId || ' (' || lang || ')' AS title
         |FROM documents
         |WHERE $sqlKind < 55 OR ($sqlKind >= 70 AND $sqlKind < 90)
         |ORDER BY url""".stripMargin,
    "x_truncate" ->
      s"""SELECT $sqlUrl AS url, substr(text, 1, 100) AS text,
         |CAST(length(substr(text, 1, 100)) AS BIGINT) AS n_chars
         |FROM documents WHERE $sqlKind >= 55 AND $sqlKind < 70
         |ORDER BY url""".stripMargin)
}
