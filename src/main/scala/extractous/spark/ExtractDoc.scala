package extractous.spark

import extractous.config.ExtractorConfig
import extractous.core.Extract
import extractous.model.{ExtractResult, ExtractedDoc, WebPage}
import extractous.sniff.MimeSniffer
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.xbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The extraction surface exposed to Spark SQL / DataFrames.
  *
  * `extract_doc(html)` is a custom Catalyst scalar expression — not a Scala UDF
  * — so Catalyst sees a normal null-safe, deterministic, prunable expression
  * (SURVEY.md §4.4): column pruning keeps the scan at `url, html`, the hot path
  * stays one narrow `ProjectExec`, and a poison row maps to a status column
  * instead of a task failure. Per-document parsing is row-at-a-time by nature,
  * so codegen falls back to `eval` (CodegenFallback) while the surrounding
  * project/filter stages still fuse into whole-stage codegen.
  */
object ExtractDocExpr {
  val metadataType: DataType = MapType(StringType, ArrayType(StringType, containsNull = false), valueContainsNull = false)
  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("xml", StringType, nullable = false),
    StructField("metadata", metadataType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("error", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("extractor_version", StringType, nullable = false)))

  def toInternalRow(r: ExtractResult): InternalRow = {
    val keys = r.metadata.keys.toArray.sorted
    val mapData = new ArrayBasedMapData(
      new GenericArrayData(keys.map(k => UTF8String.fromString(k)).asInstanceOf[Array[Any]]),
      new GenericArrayData(keys.map(k => new GenericArrayData(
        r.metadata(k).map(v => UTF8String.fromString(v)).toArray.asInstanceOf[Array[Any]])).asInstanceOf[Array[Any]]))
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.text),
      UTF8String.fromString(r.xml),
      mapData,
      r.status,
      UTF8String.fromString(r.error),
      UTF8String.fromString(r.contentType),
      UTF8String.fromString(ExtractResult.Version)))
  }
}

final case class ExtractDocExpr(child: Expression, cfg: ExtractorConfig)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ExtractDocExpr.schema
  override def nullable: Boolean = false
  override def prettyName: String = "extract_doc"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"extract_doc expects BINARY input, got ${child.dataType.sql}")

  /** Null payload is a valid document (empty fast path), so eval is overridden
    * rather than nullSafeEval (/root/reference/extractor.go:457-459).
    */
  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    ExtractDocExpr.toInternalRow(Extract(bytes, cfg))
  }
  override protected def withNewChildInternal(newChild: Expression): ExtractDocExpr = copy(child = newChild)
}

/** Cheap magic-byte MIME sniff as its own expression — the dispatch predicate
  * exposed standalone so corpus-level routing (e.g. "only OCR the image rows")
  * can be expressed as a Catalyst filter that prunes work before the expensive
  * parse (SURVEY.md §4, OCR-Auto analogue).
  */
final case class SniffMimeExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "sniff_mime"
  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    UTF8String.fromString(MimeSniffer.sniff(bytes))
  }
  override protected def withNewChildInternal(newChild: Expression): SniffMimeExpr = copy(child = newChild)
}

/** Extraction through the chunked-stream consumer (reference stream path:
  * ExtractBytesToStream + Read loop, #3/#32/#33 in SURVEY §2.1): reassembles
  * the text from bounded chunks and reports the chunk count — the EOF/partial-
  * read contract is exercised per row, and the result must equal the string
  * path byte-for-byte.
  */
final case class ExtractStreamExpr(child: Expression, cfg: ExtractorConfig, chunkSize: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "extract_stream"

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    val r = Extract(bytes, cfg)
    val out = new java.io.ByteArrayOutputStream()
    var n = 0
    Extract.stream(r, chunkSize).foreach { chunk =>
      require(chunk.length <= chunkSize, "stream chunk exceeds requested size")
      out.write(chunk)
      n += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), n, out.size()))
  }
  override protected def withNewChildInternal(newChild: Expression): ExtractStreamExpr = copy(child = newChild)
}

/** WARC ingest surface: one Common-Crawl `.warc`/`.warc.gz` file → the array
  * of its records as `(url, warc_date, rec_type, content_type, payload)`
  * structs, HTTP responses already decoded to their entity bytes (chunked
  * framing removed, gzip Content-Encoding inflated). `explode(warc_records(
  * content))` over a `binaryFile` scan is the ingest plan that POPULATES the
  * corpus table the rest of the engine reads (north rule: "Iceberg table of
  * Common-Crawl-style web pages") — a narrow per-file transform: no shuffle,
  * parallel over files, each file decoded once on the executor that read it.
  *
  * Error posture matches ingest reality — losses are ACCOUNTED, never
  * silent, and never a task failure: structural corruption truncates the
  * file at the torn record and appends a `rec_type = "file_error"` row (the
  * gigabyte of good pages before a torn tail survives); a response whose
  * HTTP message is malformed becomes a `rec_type = "response_error"` row.
  * Both carry the error text in `content_type` and an empty payload, so
  * ingest observability is one `groupBy(rec_type).count()` away and the
  * page path is a simple `rec_type = 'response'` filter.
  */
final case class WarcRecordsExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(WarcRecordsExpr.recordType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "warc_records"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"warc_records expects BINARY input, got ${child.dataType.sql}")

  private def row(url: String, date: String, recType: String, ctype: String,
      payload: Array[Byte]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(url), UTF8String.fromString(date),
      UTF8String.fromString(recType), UTF8String.fromString(ctype), payload))

  private def trimMsg(m: String): String =
    if (m.length > 200) m.substring(0, 200) else m

  private def trimMsg(e: Exception): String =
    trimMsg(if (e.getMessage == null) e.toString else e.getMessage)

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    // SQL NULL carried no file at all — not a loss, no phantom accounting
    if (bytes == null) return new GenericArrayData(Array.empty[Any])
    if (bytes.isEmpty)
      // a 0-byte crawl file (torn upload) IS a loss — account it
      return new GenericArrayData(Array[Any](row("", "", "file_error", "empty input", Array.emptyByteArray)))
    val plain =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        try extractous.core.Extract.gunzip(bytes, maxOut = 1 << 30)
        catch {
          case e: Exception =>
            return new GenericArrayData(Array[Any](row("", "", "file_error", trimMsg(e), Array.emptyByteArray)))
        }
      else bytes
    val (recs, fileErr) = extractous.core.WarcExtractor.recordsLenient(plain)
    val rows = recs.flatMap { rec =>
      rec.warcType match {
        case "response" if rec.contentType.startsWith("application/http") =>
          try Some(row(rec.targetUri, rec.date, rec.warcType, rec.contentType,
            extractous.core.WarcExtractor.httpBody(rec.block)))
          catch {
            case e: Exception =>
              Some(row(rec.targetUri, rec.date, "response_error", trimMsg(e), Array.emptyByteArray))
          }
        case "response" =>
          // a response record whose Content-Type is not application/http
          // (missing header, exotic value) is a LOSS and must be accounted —
          // "losses are ACCOUNTED, never silent" is this source's contract
          Some(row(rec.targetUri, rec.date, "response_error",
            s"non-http response content-type '${rec.contentType}'", Array.emptyByteArray))
        case "resource" | "conversion" =>
          Some(row(rec.targetUri, rec.date, rec.warcType, rec.contentType, rec.block))
        case _ => None // warcinfo/request/metadata: structural skip by design
      }
    } ++ fileErr.map(msg => row("", "", "file_error", trimMsg(msg), Array.emptyByteArray))
    new GenericArrayData(rows.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): WarcRecordsExpr = copy(child = newChild)
}

object WarcRecordsExpr {
  val recordType: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

/** Column-level API + typed Dataset API + SQL registration. */
object functions {
  def extract_doc(c: Column, cfg: ExtractorConfig = ExtractorConfig.default): Column =
    ColumnBridge.column(ExtractDocExpr(ColumnBridge.expression(c), cfg))

  def extract_stream(c: Column, cfg: ExtractorConfig = ExtractorConfig.default,
      chunkSize: Int = 65536): Column =
    ColumnBridge.column(ExtractStreamExpr(ColumnBridge.expression(c), cfg, chunkSize))

  /** Status code → human message (reference errors.rs:61-80 / SURVEY §2.1 #42)
    * as a pure codegen'd CASE expression.
    */
  def status_message(status: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    extractous.model.ExtractStatus.message.toSeq.sortBy(_._1).foldLeft(lit("unknown status")) {
      case (acc, (code, msg)) => when(status === code, lit(msg)).otherwise(acc)
    }
  }

  def sniff_mime(c: Column): Column =
    ColumnBridge.column(SniffMimeExpr(ColumnBridge.expression(c)))

  def warc_records(c: Column): Column =
    ColumnBridge.column(WarcRecordsExpr(ColumnBridge.expression(c)))

  /** Register `extract_doc` / `sniff_mime` for SQL use with a fixed config. */
  def register(spark: SparkSession, cfg: ExtractorConfig = ExtractorConfig.default): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_doc", exprs => ExtractDocExpr(exprs.head, cfg), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sniff_mime", exprs => SniffMimeExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "warc_records", exprs => WarcRecordsExpr(exprs.head), "scala_udf")
  }

  /** Typed flagship map stage: `Dataset[WebPage] → Dataset[ExtractedDoc]` — a
    * narrow per-row transform; no shuffle on the hot path (north rule).
    */
  def extractPages(ds: Dataset[WebPage], cfg: ExtractorConfig = ExtractorConfig.default): Dataset[ExtractedDoc] = {
    import ds.sparkSession.implicits._
    ds.map { p =>
      val r = Extract(p.html, cfg)
      ExtractedDoc(p.url, r.text, r.xml, r.metadata, r.status, r.error, r.contentType, ExtractResult.Version)
    }
  }

  /** Untyped flagship projection over the expression (pruning-friendly).
    * `keep` carries extra input columns (e.g. the partition column) through.
    */
  def extractFrame(df: DataFrame, cfg: ExtractorConfig = ExtractorConfig.default,
      keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.col
    val keepCols = keep.map(col)
    df.select(col("url") +: keepCols :+ extract_doc(col("html"), cfg).as("r"): _*)
      .select(col("url") +: keepCols :+ col("r.text").as("text") :+ col("r.xml").as("xml") :+
        col("r.metadata").as("metadata") :+ col("r.status").as("status") :+
        col("r.error").as("error") :+ col("r.content_type").as("content_type") :+
        col("r.extractor_version").as("extractor_version"): _*)
  }
}
