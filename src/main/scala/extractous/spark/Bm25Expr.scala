package extractous.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.xbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term-frequency scan for keyword retrieval (BM25).
  *
  * `term_freqs(text, terms)` → struct(dl, tfs): the document's whitespace
  * token count and, per query term, its occurrence count — ONE pass over
  * the UTF-8 bytes, no token materialization, no explode. The classic
  * formulation (explode tokens → filter to query terms → groupBy) shuffles
  * a row per matched token; at 10^11 documents the map side should reduce
  * each document to a handful of counters before anything moves. The query
  * term list is embedded in the expression (it is query metadata, like the
  * IVF centroid table in [[NearestCellsExpr]]).
  *
  * Tokenization matches [[extractous.pipeline.TextStats.tokens]] (`\s+`
  * split, empties dropped): ASCII whitespace only, multi-byte UTF-8 units
  * are never token breaks. Terms are matched as whole tokens, byte-exact.
  */
object TermFreqsKernel {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  def compute(s: UTF8String, terms: Array[Array[Byte]]): InternalRow = {
    val b = s.getBytes
    val n = b.length
    val tfs = new Array[Long](terms.length)
    var dl = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      if (i < n) {
        val st = i
        while (i < n && !isWs(b(i))) i += 1
        dl += 1
        val len = i - st
        var t = 0
        var matched = false
        while (t < terms.length && !matched) {
          val tm = terms(t)
          if (tm.length == len) {
            var j = 0
            while (j < len && tm(j) == b(st + j)) j += 1
            if (j == len) { tfs(t) += 1; matched = true }
          }
          t += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](
      dl,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(tfs)))
  }
}

final case class TermFreqsExpr(child: Expression, terms: Seq[String])
  extends UnaryExpression {

  require(terms.nonEmpty && terms.forall(_.nonEmpty), "query terms must be non-empty")
  require(terms.distinct == terms, "query terms must be distinct")

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tfs", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "term_freqs"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TermFreqsKernel.compute(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25Terms", termBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"extractous.spark.TermFreqsKernel.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqsExpr =
    copy(child = newChild)
}

object retrieval {
  /** `term_freqs(text, terms)` → struct(dl, tfs) — see [[TermFreqsKernel]]. */
  def term_freqs(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermFreqsExpr(ColumnBridge.expression(text), terms))
}
